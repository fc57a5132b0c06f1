from outfitx_tpu.losses.focal import focal_loss  # noqa: F401
from outfitx_tpu.losses.ranking import set_wise_ranking_loss  # noqa: F401
