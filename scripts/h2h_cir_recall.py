"""CIR Recall@k cross-validation on SHARED WEIGHTS with the reference's
own evaluator (VERDICT r3 item 2 — the last eval protocol without a
shared-weights cross-check).

Protocol:
  1. Load our orbax CIR params; fill them into the ACTUAL reference
     ``OutfitX`` module (scripts/h2h_export_ckpt.fill_state_dict — the
     same layout mapping as ``cli export-torch``).
  2. Build the reference's own valid dataset/processor/dataloader
     (``PolyvoreComplementaryItemRetrievalDataset`` mode='valid') with the
     global ``random`` seeded, so its candidate pools
     (polyvore_complementary_item_retrieval_dataset.py:111-153) and its
     per-example positive pops (:50-67) are pinned and recordable.
  3. Run the reference model over the loader (its valid_epoch forward) and
     score recall with the REFERENCE'S ``compute_recall_metrics``
     (complementary_item_retrieval_trainer.py:192-249) — reference code
     verbatim, reference pools.
  4. Our side: the recorded input tensors (outfit_embedding/outfit_mask/
     target text emb — the identical realized queries) go through OUR
     ``cir_forward`` on the SAME params, and recall comes from OUR
     ``recall_over_pools`` against the SAME pools (the reference's pool
     rows injected into our ``CandidatePools``).
  5. Isolation check: our ``recall_over_pools`` on the REFERENCE'S y_hats
     — any metric-protocol difference shows here with forwards factored
     out entirely.

Usage:
  python scripts/h2h_cir_recall.py \
      --params checkpoints/outfitx-tpu-siglip-d1536-cir/best_recall@1 \
      --dataset-dir /tmp/pv_h2h --out /tmp/h2h_cir_recall.json
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import pickle
import random
import sys
import types

import numpy as np

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

from scripts.h2h_export_ckpt import fill_state_dict  # noqa: E402
from scripts.h2h_reference import install_stubs  # noqa: E402


def load_shards(ds_dir: pathlib.Path) -> dict:
    emb = {}
    for shard in sorted(
        (ds_dir / "precomputed_embeddings").glob("*_embedding_subset_*.pkl")
    ):
        with open(shard, "rb") as f:
            data = pickle.load(f)
        for iid, e in zip(data["ids"], data["embeddings"]):
            emb[int(iid)] = np.asarray(e, dtype=np.float32)
    if not emb:
        raise FileNotFoundError(f"no embedding shards under {ds_dir}")
    return emb


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", required=True, help="orbax checkpoint path")
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default=None, help="write the JSON result here")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # torch+jax in one process

    install_stubs(os.devnull)
    sys.path.insert(0, "/root/reference")

    import torch
    from torch.utils.data import DataLoader

    from src.models import OutfitX
    from src.models.configs import OutfitXConfig as RefOutfitXConfig
    from src.models.datatypes import OutfitComplementaryItemRetrievalTask
    from src.models.processor.outfit_x.outfit_x_processor_factory import (
        OutfitXProcessorFactory,
    )
    from src.trains.datasets.polyvore.polyvore_complementary_item_retrieval_dataset import (  # noqa: E501
        PolyvoreComplementaryItemRetrievalDataset,
    )
    from src.trains.trainers.complementary_item_retrieval_trainer import (
        ComplementaryItemRetrievalTrainer,
    )

    ds_dir = pathlib.Path(args.dataset_dir)
    emb_dict = load_shards(ds_dir)
    top_k_list = [1, 5, 10, 15, 30, 50]

    # ---- reference side: seeded pools + seeded query realization --------
    random.seed(args.seed)
    ref_cfg = RefOutfitXConfig()
    dataset = PolyvoreComplementaryItemRetrievalDataset(
        polyvore_type="nondisjoint",
        mode="valid",
        dataset_dir=ds_dir,
        embedding_dict=emb_dict,
        negative_sample_mode="easy",
    )
    processor = OutfitXProcessorFactory.get_processor(
        OutfitComplementaryItemRetrievalTask, cfg=ref_cfg, run_mode="valid"
    )
    loader = DataLoader(
        dataset,
        batch_size=args.batch_size,
        shuffle=False,
        num_workers=0,
        collate_fn=processor,
    )

    ref_model = OutfitX(cfg=ref_cfg)
    ref_model.eval()

    from outfitx_tpu.train.checkpoint import CheckpointManager

    p = pathlib.Path(args.params)
    payload = CheckpointManager(p.parent.parent, p.parent.name).restore(p.name)
    fill_state_dict(ref_model, payload["params"])

    y_hats_ref, pos_ids, recorded = [], [], []
    with torch.no_grad():
        for batch in loader:
            inp = batch["input_dict"]
            y_hats_ref.append(ref_model(**inp).detach())
            pos_ids.extend(batch["pos_item_id"])
            recorded.append(
                {
                    "emb": inp["outfit_embedding"].numpy(),
                    "mask": inp["outfit_mask"].numpy(),
                    "text": inp["target_item_text_embedding"].numpy(),
                }
            )
    y_hats_ref = torch.cat(y_hats_ref, dim=0).squeeze(1)

    # the REFERENCE'S OWN recall protocol, verbatim (its method needs only
    # local_rank / device_type / cfg.use_amp from the trainer instance)
    shim = types.SimpleNamespace(
        local_rank=torch.device("cpu"),
        device_type="cpu",
        cfg=types.SimpleNamespace(use_amp=False),
    )
    ref_metrics = ComplementaryItemRetrievalTrainer.compute_recall_metrics(
        shim,
        top_k_list=top_k_list,
        dataloader=loader,
        y_hats=y_hats_ref,
        pos_item_ids=pos_ids,
    )
    ref_metrics = {k: float(v) for k, v in ref_metrics.items()}

    # ---- our side: same params, same realized queries, same pools -------
    import dataclasses

    import jax.numpy as jnp

    from outfitx_tpu.core.config import OutfitXConfig
    from outfitx_tpu.data.catalog import Catalog
    from outfitx_tpu.data.sampler import CandidatePools
    from outfitx_tpu.evalm.retrieval_eval import recall_over_pools
    from outfitx_tpu.models import OutfitXModel

    # f32 compute to match the reference's CPU math (the parity contract
    # used by every PARITY.md §6 cross-check)
    cfg = dataclasses.replace(OutfitXConfig(), compute_dtype="float32")
    model = OutfitXModel(cfg)
    prefix = sorted(
        (ds_dir / "precomputed_embeddings").glob("*_embedding_subset_*.pkl")
    )[0].name.split("_embedding_subset_")[0]
    catalog = Catalog.from_polyvore(ds_dir, model_name=prefix)

    fwd = jax.jit(model.cir_forward)
    y_ours = np.concatenate(
        [
            np.asarray(
                fwd(
                    payload["params"],
                    jnp.asarray(b["emb"]),
                    jnp.asarray(b["mask"]),
                    jnp.asarray(b["text"]),
                )
            )
            for b in recorded
        ]
    )

    # inject the REFERENCE'S pool rows (identical membership AND order)
    pools = CandidatePools(
        pools={
            int(cid): catalog.rows(info["item_ids"])
            for cid, info in dataset.candidate_pools.items()
        },
        pool_size=max(
            len(info["item_ids"]) for info in dataset.candidate_pools.values()
        ),
    )
    pos_rows = catalog.rows([int(i) for i in pos_ids])
    pos_cats = np.asarray(catalog.category_id)[pos_rows]
    cat_dev = jnp.asarray(catalog.embeddings)

    ours = {
        k: float(v)
        for k, v in recall_over_pools(
            y_ours, pos_rows, pos_cats, pools, cat_dev, ks=top_k_list
        ).items()
    }
    # isolation: our metric code on the REFERENCE'S scores
    ours_on_ref = {
        k: float(v)
        for k, v in recall_over_pools(
            y_hats_ref.numpy(), pos_rows, pos_cats, pools, cat_dev,
            ks=top_k_list,
        ).items()
    }

    def _n(d):  # Recall@k / recall@k name alignment
        return {k.lower(): v for k, v in d.items()}

    ref_n, ours_n, iso_n = _n(ref_metrics), _n(ours), _n(ours_on_ref)
    result = {
        "n_queries": len(pos_ids),
        "n_pools": len(dataset.candidate_pools),
        "reference_compute_recall_metrics": ref_n,
        "ours_recall_over_pools_own_forward": ours_n,
        "ours_recall_over_pools_on_reference_yhats": iso_n,
        "protocol_isolation_exact": iso_n == ref_n,
        "max_abs_diff_shared_weights": max(
            abs(ref_n[k] - ours_n[k]) for k in ref_n
        ),
        "forward_max_abs_diff": float(
            np.max(np.abs(y_ours - y_hats_ref.numpy()))
        ),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
