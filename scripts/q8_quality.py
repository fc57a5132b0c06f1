"""Quality delta of the int8 (W8A8) serving forward on TRAINED models.

Random-init drift (tests/test_quantized_model.py) bounds the numeric
error, but the serving question is metric movement on a trained
checkpoint: train CP and CIR on synthetic data, then score the SAME eval
split through the f32/bf16 forward and the int8 forward and report
AUC / recall@k side by side (reference eval protocols:
compatibility_prediction_trainer.py:406-436,
complementary_item_retrieval_trainer.py:192-249).

CPU by default (tiny model, minutes); --tpu runs on the ambient TPU.
Artifacts: parity_artifacts/q8_quality.json.

Run: python scripts/q8_quality.py [--d 256] [--epochs 10]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=256, help="d_embed")
    ap.add_argument("--n-layers", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--cir-epochs", type=int, default=8)
    ap.add_argument("--items", type=int, default=2000)
    ap.add_argument("--outfits", type=int, default=2048)
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--tpu", dest="cpu", action="store_false")
    ns = ap.parse_args()

    import jax

    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from outfitx_tpu.core.config import (
        CIRTrainConfig,
        CPTrainConfig,
        ItemEncoderConfig,
        OptimizerConfig,
        OutfitXConfig,
        TransformerConfig,
    )
    from outfitx_tpu.data.synthetic import make_synthetic
    from outfitx_tpu.evalm.metrics import binary_classification_metrics
    from outfitx_tpu.evalm.retrieval_eval import recall_over_pools
    from outfitx_tpu.models import OutfitXModel
    from outfitx_tpu.models.quantized import (
        QuantizedOutfitX,
        quantize_outfitx_params,
    )
    from outfitx_tpu.train.cir_trainer import CIRTrainer
    from outfitx_tpu.train.cp_trainer import CPTrainer

    model_cfg = OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=ns.d // 2),
        transformer=TransformerConfig(
            n_heads=8, d_ffn=2 * ns.d, n_layers=ns.n_layers, dropout=0.1
        ),
        max_outfit_len=8,
        compute_dtype="float32",
    )
    synth = make_synthetic(
        n_items=ns.items, d_embed=ns.d, n_outfits=ns.outfits, seed=7
    )
    model = OutfitXModel(model_cfg)
    q8 = QuantizedOutfitX(model_cfg)
    out = {"d": ns.d, "n_layers": ns.n_layers}

    # ----------------------------------------------------------- CP -----
    import tempfile

    work = pathlib.Path(tempfile.mkdtemp(prefix="q8_quality_"))
    cp_cfg = CPTrainConfig(
        n_epochs=ns.epochs,
        batch_size=256,
        accumulation_steps=1,
        optimizer=OptimizerConfig(learning_rate=1e-3),
        checkpoint_dir=str(work / "ckpt"),
        log_dir=str(work / "logs"),
    )
    with CPTrainer(
        cp_cfg,
        model_cfg,
        catalog=synth.catalog,
        train_split=synth.cp_train,
        valid_split=synth.cp_valid,
    ) as t:
        t.run()
        params = jax.tree.map(np.asarray, t.state.params)
        catalog_dev = t.catalog_dev
        split = synth.cp_valid

        def score_all(fwd, p):
            scores = []
            bs = 512
            for s in range(0, len(split), bs):
                rows = jnp.asarray(split.item_rows[s : s + bs])
                mask = jnp.asarray(split.mask[s : s + bs])
                emb = jnp.take(catalog_dev, rows, axis=0)
                scores.append(np.asarray(fwd(p, emb, mask)))
            return np.concatenate(scores)

        s_f32 = score_all(jax.jit(model.cp_forward), params)
        qp = quantize_outfitx_params(params, model_cfg)
        s_q8 = score_all(jax.jit(q8.cp_forward), qp)
        m_f32 = binary_classification_metrics(
            s_f32, split.labels, from_logits=True
        )
        m_q8 = binary_classification_metrics(
            s_q8, split.labels, from_logits=True
        )
        out["cp"] = {
            "auc_f32": round(m_f32["auc"], 6),
            "auc_q8": round(m_q8["auc"], 6),
            "auc_delta": round(m_q8["auc"] - m_f32["auc"], 6),
            "acc_f32": round(m_f32["acc"], 6),
            "acc_q8": round(m_q8["acc"], 6),
            "prob_max_shift": round(
                float(
                    np.max(
                        np.abs(
                            1 / (1 + np.exp(-s_f32)) - 1 / (1 + np.exp(-s_q8))
                        )
                    )
                ),
                5,
            ),
        }
    print(json.dumps({"phase": "cp", **out["cp"]}), flush=True)

    # ---------------------------------------------------------- CIR -----
    cir_cfg = CIRTrainConfig(
        n_epochs=ns.cir_epochs,
        batch_size=128,
        accumulation_steps=1,
        optimizer=OptimizerConfig(learning_rate=1e-3),
        switch_to_hard_epoch=ns.cir_epochs // 2,
        recall_every=2,
        candidate_pool_size=256,
        checkpoint_dir=str(work / "ckpt_cir"),
        log_dir=str(work / "logs_cir"),
    )
    with CIRTrainer(
        cir_cfg,
        model_cfg,
        catalog=synth.catalog,
        train_split=synth.cir_train,
        valid_split=synth.cir_valid,
        pool_threshold=1,
    ) as t:
        t.run()
        params = jax.tree.map(np.asarray, t.state.params)
        qp = quantize_outfitx_params(params, model_cfg)
        q = t._eval_queries
        catalog_dev = t.catalog_dev
        d = synth.catalog.d_embed

        def predict_all(fwd, p):
            ys = []
            bs = 512
            n = len(q["pos_idx"])
            for s in range(0, n, bs):
                rows = jnp.asarray(q["item_idx"][s : s + bs])
                mask = jnp.asarray(q["mask"][s : s + bs])
                pos = jnp.asarray(q["pos_idx"][s : s + bs])
                emb = jnp.take(catalog_dev, rows, axis=0)
                text = jnp.take(catalog_dev, pos, axis=0)[:, d // 2 :]
                ys.append(np.asarray(fwd(p, emb, mask, text)))
            return np.concatenate(ys)

        y_f32 = predict_all(jax.jit(model.cir_forward), params)
        y_q8 = predict_all(jax.jit(q8.cir_forward), qp)
        r_f32 = recall_over_pools(
            y_f32, q["pos_idx"], q["pos_category"], t._pools, catalog_dev
        )
        r_q8 = recall_over_pools(
            y_q8, q["pos_idx"], q["pos_category"], t._pools, catalog_dev
        )
        out["cir"] = {
            **{f"{k}_f32": round(v, 6) for k, v in r_f32.items()},
            **{f"{k}_q8": round(v, 6) for k, v in r_q8.items()},
            "recall@10_delta": round(
                r_q8["recall@10"] - r_f32["recall@10"], 6
            ),
        }
    print(json.dumps({"phase": "cir", **out["cir"]}), flush=True)

    art = REPO / "parity_artifacts" / "q8_quality.json"
    art.write_text(json.dumps(out, indent=1))
    print("wrote", art, flush=True)


if __name__ == "__main__":
    main()
