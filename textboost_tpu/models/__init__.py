from .clip import CLIPTextModel, LoRADense  # noqa: F401
from .configs import (  # noqa: F401
    ALIASES,
    SPECS,
    CLIPTextConfig,
    ModelSpec,
    SchedulerConfig,
    UNetConfig,
    VAEConfig,
    get_spec,
)
from .textboost import apply_null_embedding_patch, encode_prompt  # noqa: F401
from .unet import UNet2DCondition  # noqa: F401
from .vae import AutoencoderKL  # noqa: F401
