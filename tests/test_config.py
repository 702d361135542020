"""Config machinery tests: three-tier merge precedence (defaults < YAML <
key=value CLI, ≡ ``utils/config.py:104``), cfg_name derivation, dump, and
the leader/precision helpers."""

import json

import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from tts_with_diffusion_model_tpu.config import Config


def test_defaults_match_reference():
    cfg = Config.from_cli(argv=[])
    assert cfg.batch_size == 32
    assert cfg.max_iter == 1_000_000
    assert cfg.warmup_max_lr == 1e-5
    assert cfg.gradient_clipping == 1.0
    assert cfg.p_additional_prompt == 0.8
    assert cfg.max_prompts == 6
    assert cfg.min_phones == 10 and cfg.max_phones == 50
    assert cfg.sample_rate == 24_000
    assert cfg.num_tokens == 1024


def test_yaml_and_cli_merge_precedence(tmp_path):
    y = tmp_path / "conf" / "run.yml"
    y.parent.mkdir()
    y.write_text(yaml.safe_dump({"batch_size": 8, "model": "nar"}))
    cfg = Config.from_cli(argv=[f"yaml={y}", "batch_size=4", "max_iter=77"])
    assert cfg.model == "nar"       # from YAML
    assert cfg.batch_size == 4      # CLI overrides YAML
    assert cfg.max_iter == 77       # CLI overrides default


def test_cfg_name_from_yaml_path(tmp_path):
    y = tmp_path / "config" / "test" / "diffused.yml"
    y.parent.mkdir(parents=True)
    y.write_text(yaml.safe_dump({"model": "diffusion"}))
    cfg = Config.from_cli(argv=[f"yaml={y}"])
    # cfg_name strips the config root and suffix (≡ utils/config.py:97-99)
    assert "diffused" in cfg.cfg_name


def test_cli_type_coercion():
    cfg = Config.from_cli(argv=[
        "use_fp16=false", "warmup_max_lr=2e-4", "save_ckpt_every=null",
    ])
    assert cfg.use_fp16 is False
    assert cfg.warmup_max_lr == pytest.approx(2e-4)
    assert cfg.save_ckpt_every is None


def test_optimizer_cfg_mirrors_ds_cfg():
    cfg = Config.from_cli(argv=[])
    oc = cfg.optimizer_cfg
    assert oc["scheduler"]["warmup_max_lr"] == cfg.warmup_max_lr
    assert oc["scheduler"]["total_num_steps"] == cfg.max_iter
    assert oc["gradient_clipping"] == cfg.gradient_clipping
    assert oc["bf16"]["enabled"] is True


def test_dump_writes_cfg_json(tmp_path):
    cfg = Config.from_cli(argv=[f"log_root={tmp_path}"])
    path = tmp_path / "cfg.json"
    cfg.dump(path)
    data = json.loads(path.read_text())
    assert data["batch_size"] == 32
    assert "git_commit" in data


def test_distributed_single_process_world():
    from tts_with_diffusion_model_tpu.utils.distributed import (
        barrier,
        broadcast_object,
        global_leader_only,
        global_rank,
        is_global_leader,
        world_size,
    )

    assert world_size() == 1
    assert global_rank() == 0
    assert is_global_leader()
    assert broadcast_object("hello") == "hello"
    barrier()  # no-op in a world of one

    calls = []

    @global_leader_only(default="skipped")
    def only_leader():
        calls.append(1)
        return "ran"

    assert only_leader() == "ran" and calls == [1]


def test_cast_params_bf16_rules():
    from tts_with_diffusion_model_tpu.utils.precision import cast_params_bf16

    params = {
        "params": {
            "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
            "norm_attn": {"scale": jnp.ones((4, 4))},
        }
    }
    out = cast_params_bf16(params)
    assert out["params"]["dense"]["kernel"].dtype == jnp.bfloat16
    assert out["params"]["dense"]["bias"].dtype == jnp.float32  # 1-D kept
    assert out["params"]["norm_attn"]["scale"].dtype == jnp.float32  # norms kept
