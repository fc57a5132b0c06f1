from outfitx_tpu.models.towers.vision import VisionTower, VisionTowerConfig  # noqa: F401
from outfitx_tpu.models.towers.text import TextTower, TextTowerConfig  # noqa: F401
