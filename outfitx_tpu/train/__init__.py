from outfitx_tpu.train.optim import make_optimizer  # noqa: F401
from outfitx_tpu.train.state import TrainState  # noqa: F401
