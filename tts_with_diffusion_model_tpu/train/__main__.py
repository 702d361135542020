from .train import main

if __name__ == "__main__":
    main()
    # final statement: dodge the axon-tunnel teardown wedge
    # (utils/helpers.hard_exit_if_tunnel docstring); no-op off-tunnel
    from tts_with_diffusion_model_tpu.utils.helpers import (  # noqa: E402
        hard_exit_if_tunnel,
    )

    hard_exit_if_tunnel()
