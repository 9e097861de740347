from indm_tpu.models import registry
from indm_tpu.models.registry import (
    create_model,
    get_model,
    get_model_fn,
    get_score_fn,
    get_sigmas,
    register_model,
)

# Import model definitions so they register themselves (mirrors
# `run_lib.py:22` importing ddpm/ncsnv2/ncsnpp/vdm for registration).
from indm_tpu.models import ncsnpp as _ncsnpp  # noqa: F401
from indm_tpu.models import ddpm as _ddpm  # noqa: F401
from indm_tpu.models import ncsnv2 as _ncsnv2  # noqa: F401
from indm_tpu.models import vdm as _vdm  # noqa: F401
