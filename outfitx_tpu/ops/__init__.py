from outfitx_tpu.ops.activations import mish, resolve_activation  # noqa: F401
from outfitx_tpu.ops.layernorm import layer_norm  # noqa: F401
from outfitx_tpu.ops.attention import masked_mha  # noqa: F401
from outfitx_tpu.ops.retrieval import pairwise_l2, topk_smallest  # noqa: F401
