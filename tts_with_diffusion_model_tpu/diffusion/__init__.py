from .schedules import (  # noqa: F401
    cosine_beta_schedule,
    linear_beta_schedule,
    vpsde_beta_schedule,
)
from .d3pm import D3PM  # noqa: F401
