from outfitx_tpu.data.catalog import Catalog  # noqa: F401
from outfitx_tpu.data.splits import CPSplit, FITBSplit, OutfitSplit  # noqa: F401
