"""Checkpointing: orbax-backed pytree save/restore + best-metric policies.

Replaces the reference's torch.save/.load of {epoch, config, model, optimizer,
scheduler, scaler} dicts (distributed_trainer.py:427-476) with orbax pytree
checkpoints. Policies preserved: best-metric checkpoints named
``best_{metric}`` (compatibility_prediction_trainer.py:489-502), a ``final``
save on clean exit (distributed_trainer.py:643-646), and cross-task chaining
CP -> CIR -> FITB via params-only restore
(complementary_item_retrieval_trainer.py:352-359,
fill_in_the_blank_trainer.py:100-107).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def migrate_legacy_attn(params):
    """Stack pre-fusion per-projection attention params into the fused
    layout (wq/wk/wv -> wqkv (L, d, 3, d); bq/bk/bv -> bqkv (L, 3, d)).

    Checkpoints written before the QKV fusion (best_auc chains, CP->CIR
    warm starts) carry the legacy pytree; this converts in place at
    restore time so they keep loading. Returns True if a conversion
    happened."""
    attn = (
        params.get("layers", {}).get("attn")
        if isinstance(params, dict)
        else None
    )
    if not isinstance(attn, dict) or "wq" not in attn or "wqkv" in attn:
        return False
    attn["wqkv"] = np.stack(
        [np.asarray(attn.pop(k)) for k in ("wq", "wk", "wv")], axis=2
    )
    attn["bqkv"] = np.stack(
        [np.asarray(attn.pop(k)) for k in ("bq", "bk", "bv")], axis=1
    )
    return True


class CheckpointManager:
    def __init__(self, root: str | pathlib.Path, model_name: str):
        self.dir = pathlib.Path(root).absolute() / model_name
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    def path(self, tag: str) -> pathlib.Path:
        return self.dir / tag

    def save(
        self,
        tag: str,
        *,
        params,
        opt_state=None,
        step: int = 0,
        epoch: int = 0,
        metrics: Optional[Dict[str, float]] = None,
        config: Any = None,
        best: Optional[Dict[str, float]] = None,
        overwrite: bool = True,
    ) -> pathlib.Path:
        path = self.path(tag)
        payload = {"params": _to_host(params)}
        if opt_state is not None:
            payload["opt_state"] = _to_host(opt_state)
        self._ckpt.save(path, payload, force=overwrite)
        meta = {
            "step": int(step),
            "epoch": int(epoch),
            "metrics": {k: float(v) for k, v in (metrics or {}).items()},
        }
        if best:
            # Best-so-far values per tracked metric, so a resumed run
            # cannot overwrite a better best_* checkpoint with a worse one.
            meta["best"] = {k: float(v) for k, v in best.items()}
        if config is not None and dataclasses.is_dataclass(config):
            meta["config"] = dataclasses.asdict(config)
        with open(path / "meta.json", "w") as f:
            json.dump(meta, f, indent=2, default=str)
        return path

    def restore(
        self,
        tag_or_path: str | pathlib.Path,
        template: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, Any]:
        """template: pytree skeleton (e.g. {'params': ..., 'opt_state': ...})
        so structured leaves (optax NamedTuples) restore into the right
        container types rather than raw dicts/lists."""
        path = pathlib.Path(tag_or_path)
        if not path.exists():
            path = self.path(str(tag_or_path))
        probe = self._ckpt.restore(path)
        legacy = migrate_legacy_attn(probe.get("params", {}))
        if template is not None and not legacy:
            import jax

            saved_keys = set()
            # restore only the subtrees that were saved
            item = {}
            for k in template:
                if k in probe:
                    item[k] = jax.tree.map(lambda x: x, template[k])
                    saved_keys.add(k)
            payload = self._ckpt.restore(path, item=item)
            for k in probe:
                if k not in payload:
                    payload[k] = probe[k]
        else:
            # legacy (pre-QKV-fusion) checkpoints: the raw tree was already
            # migrated above; a template item-restore would reject the old
            # layout. Params-only consumers (warm starts, chains, serving)
            # work; full optimizer resume across the fusion does not
            # (opt_state shapes changed) — see MIGRATION.md.
            payload = probe
        meta_path = path / "meta.json"
        meta = {}
        if meta_path.exists():
            with open(meta_path) as f:
                meta = json.load(f)
        payload["meta"] = meta
        return payload

    def exists(self, tag: str) -> bool:
        return self.path(tag).exists()


class BestMetricTracker:
    """Track best values and trigger checkpoint saves
    (reference maybe_save_best_models, compatibility_prediction_trainer.py:489-502)."""

    def __init__(self, **metrics_mode: str):
        # e.g. BestMetricTracker(auc='max', loss='min')
        self.mode = metrics_mode
        self.best: Dict[str, float] = {}

    def update(self, name: str, value: float) -> bool:
        mode = self.mode[name]
        cur = self.best.get(name)
        better = (
            cur is None
            or (mode == "max" and value > cur)
            or (mode == "min" and value < cur)
        )
        if better:
            self.best[name] = float(value)
        return better
