from outfitx_tpu.core.config import (  # noqa: F401
    ItemEncoderConfig,
    OutfitXConfig,
    TransformerConfig,
)
from outfitx_tpu.core.mesh import MeshSpec, make_mesh  # noqa: F401
