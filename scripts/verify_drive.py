"""verify drive: full-scale model forward/backward + masked invariance on
the real TPU through the public package surface (the /verify recipe —
.claude/skills/verify/SKILL.md). Run: python scripts/verify_drive.py"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import time
import numpy as np

t0 = time.time()
import jax, jax.numpy as jnp
from outfitx_tpu.core.runtime import enable_compilation_cache, force_platform_from_env
force_platform_from_env()  # ambient env is axon; must stay a no-op
enable_compilation_cache()
print("devices:", jax.devices(), f"({time.time()-t0:.1f}s)", flush=True)

from outfitx_tpu.core.config import OutfitXConfig
from outfitx_tpu.models import OutfitXModel
from outfitx_tpu.losses import focal_loss

cfg = OutfitXConfig()
model = OutfitXModel(cfg)
params = model.init(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
b, l, d = 256, cfg.max_outfit_len, cfg.d_embed
emb = jnp.asarray(rng.standard_normal((b, l, d)), dtype=jnp.bfloat16)
mask = jnp.asarray(np.arange(l)[None, :] >= rng.integers(2, l + 1, size=(b, 1)))
labels = jnp.asarray(rng.integers(0, 2, size=(b,)).astype(np.float32))

fwd = jax.jit(model.cp_forward)
scores = fwd(params, emb, mask)
print("cp_forward:", float(np.asarray(jnp.sum(scores[:8]))), flush=True)

# masked-item invariance: perturb padded rows -> scores unchanged
emb2 = jnp.where(mask[:, :, None], emb + 7.0, emb)
scores2 = fwd(params, emb2, mask)
delta = float(np.asarray(jnp.max(jnp.abs(scores - scores2))))
print("masked invariance delta:", delta, flush=True)
assert delta == 0.0, delta

def loss_fn(p):
    s = model.cp_forward(p, emb, mask)
    return focal_loss(s, labels).mean()

val, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
gn = float(np.asarray(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads))))
print("loss:", float(np.asarray(val)), "grad sq-norm:", gn, flush=True)
assert np.isfinite(float(np.asarray(val))) and np.isfinite(gn)

# CIR forward + retrieval against a catalog-sized pool (serving path)
from outfitx_tpu.ops.retrieval import retrieve

text = jnp.asarray(rng.standard_normal((b, d // 2)), dtype=jnp.bfloat16)
y_hat = jax.jit(model.cir_forward)(params, emb, mask, text)
print("cir_forward:", float(np.asarray(jnp.sum(y_hat[:4, :4]))), flush=True)
assert y_hat.shape == (b, d)

pool = jnp.asarray(rng.standard_normal((3000, d)), dtype=jnp.float32)
d2, idx = jax.jit(lambda q, p: retrieve(q, p, 10))(
    y_hat.astype(jnp.float32), pool
)
d2h = np.asarray(d2[:8])
print("retrieve top-10 d2[0]:", float(d2h[0, 0]), flush=True)
assert np.isfinite(d2h).all() and bool((np.diff(np.asarray(d2[:8])) >= 0).all())

# mesh-sharded retrieval (serving --shard-catalog path): compile + run the
# shard_map program over all local devices (1 on the TPU relay) and check
# it reproduces the single-device result exactly
from outfitx_tpu.core.mesh import make_mesh
from outfitx_tpu.ops.retrieval_sharded import (
    pad_rows_to_shards,
    retrieve_sharded,
)

mesh = make_mesh()
n_pad = pad_rows_to_shards(pool.shape[0], mesh.devices.size)
pool_p = jnp.pad(pool, ((0, n_pad - pool.shape[0]), (0, 0)))
d2s, idxs = retrieve_sharded(
    y_hat.astype(jnp.float32), pool_p, 10, mesh=mesh, n_rows=pool.shape[0]
)
np.testing.assert_array_equal(np.asarray(idx[:8]), np.asarray(idxs[:8]))
print("retrieve_sharded == retrieve over", mesh.devices.size, "device(s)",
      flush=True)

# int8 W8A8 serving forward (models/quantized.py): compiled int8 matmuls
# track the bf16 scores on identical inputs
from outfitx_tpu.models.quantized import (
    QuantizedOutfitX,
    quantize_outfitx_params,
)

q8 = QuantizedOutfitX(cfg)
qp = quantize_outfitx_params(params, cfg)
s_q8 = jax.jit(q8.cp_forward)(qp, emb, mask)
s_bf, s_q8h = np.asarray(scores[:64]), np.asarray(s_q8[:64])
corr = float(np.corrcoef(s_bf, s_q8h)[0, 1])
print("q8 cp_forward corr vs bf16:", corr, flush=True)
assert corr > 0.99, corr
print("DRIVE OK", flush=True)
