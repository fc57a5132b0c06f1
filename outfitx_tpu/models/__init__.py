from outfitx_tpu.models.outfit_transformer import (  # noqa: F401
    OutfitXModel,
    Task,
)
