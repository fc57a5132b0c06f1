"""One-command real-data parity runner (PARITY.md §1-4 mechanized).

Given a Polyvore-layout dataset and (optionally) a pretrained tower
checkpoint, this driver runs the full quality-parity pipeline:

  1. dataset-layout validation (PARITY.md §1.1 / reference
     base_train_config.py:53-61),
  2. tokenizer-files check (§1.2: a hash-tokenizer fallback makes quality
     parity impossible — fail fast, don't train for hours first),
  3. the precompute sweep (`cli pes`) + §2's automated spot-checks:
     embedding dim/count, and cosine-vs-HF >= 0.99 on sample items when
     the torch-side HF model is loadable from the same checkpoint dir,
  4. the CP -> CIR(warm start, curriculum) -> FITB chain (`cli cp/cir/fitb`)
     at the reference envelope (or shrunk with --smoke),
  5. final held-out test evals from the best checkpoints,
  6. PARITY_RESULTS.json with §4's envelope comparison.

Real data (the moment the network exists):

    POLYVORE=/data/polyvore TOWERS=/data/fashionSigLIP \
        bash scripts/run_parity.sh

Smoke (no downloads; generates a synthetic disk dataset with images and
runs every step end to end, shrunk):

    bash scripts/run_parity.sh --smoke
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# §4 envelopes (upstream OutfitTransformer paper, arXiv:2204.04812 Table 1;
# the reference reproduces it and publishes no numbers of its own)
ENVELOPES = {
    "cp_auc": (0.90, 0.95),
    "fitb_accuracy": (0.60, 0.70),
    "cir_recall@10_random": 10 / 3000.0,  # must be >> this
}


def run_cli(args_list, timeout=24 * 3600):
    """Run `python -m outfitx_tpu.cli ...`, return the final JSON line."""
    cmd = [sys.executable, "-m", "outfitx_tpu.cli"] + args_list
    print("+", " ".join(cmd), flush=True)
    proc = subprocess.run(
        cmd, cwd=str(REPO), capture_output=True, text=True, timeout=timeout
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"{' '.join(args_list[:2])} failed:\n{proc.stderr[-4000:]}"
        )
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in output:\n{proc.stdout[-2000:]}")


def check_layout(ds: pathlib.Path, polyvore_type: str) -> dict:
    required = [
        "item_metadata.json",
        "categories.json",
        f"{polyvore_type}/train.json",
        f"{polyvore_type}/compatibility/train.json",
        f"{polyvore_type}/compatibility/valid.json",
        f"{polyvore_type}/compatibility/test.json",
        f"{polyvore_type}/fill_in_the_blank/test.json",
    ]
    missing = [r for r in required if not (ds / r).exists()]
    return {"ok": not missing, "missing": missing}


def check_tokenizer(towers: pathlib.Path, encoder: str) -> dict:
    """§1.2: the tokenizer files must be present, and load_tokenizer must
    NOT fall back to the hash tokenizer."""
    from outfitx_tpu.data.tokenizer import HashTokenizer, load_tokenizer

    tok = load_tokenizer(str(towers))
    is_hash = isinstance(tok, HashTokenizer)
    files = sorted(
        p.name
        for p in towers.glob("*")
        if p.name
        in (
            "tokenizer.json", "vocab.json", "merges.txt",
            "tokenizer_config.json", "spiece.model",
            "sentencepiece.bpe.model", "vocab.txt",
        )
    )
    return {
        "ok": not is_hash,
        "tokenizer_files": files,
        "detail": (
            "hash-tokenizer fallback — quality parity impossible "
            "(PARITY.md §1.2): download the tokenizer files"
            if is_hash
            else f"vocabulary tokenizer loaded ({type(tok).__name__})"
        ),
    }


def check_shards(
    shard_dir: pathlib.Path, ds: pathlib.Path, model_name: str,
    d_expected: int,
) -> dict:
    import pickle

    shards = sorted(shard_dir.glob(f"{model_name}_embedding_subset_*.pkl"))
    if not shards:
        return {"ok": False, "detail": f"no shards under {shard_dir}"}
    n_total, d = 0, None
    for sh in shards:
        # pickle must load the whole payload either way; count by ids and
        # drop it immediately so at most one shard is resident
        with open(sh, "rb") as f:
            payload = pickle.load(f)
        n_total += len(payload["ids"])
        d = payload["embeddings"].shape[1]
        del payload
    with open(ds / "item_metadata.json") as f:
        meta = json.load(f)
    n_images = sum(
        1 for m in meta if (ds / "images" / f"{int(m['item_id'])}.jpg").exists()
    )
    ok = d == d_expected and n_total == n_images
    return {
        "ok": ok,
        "shards": len(shards),
        "n_embeddings": n_total,
        "n_items_with_images": n_images,
        "d_embed": d,
        "d_expected": d_expected,
    }


def check_hf_cosine(
    shard_dir: pathlib.Path, ds: pathlib.Path, towers: pathlib.Path,
    model_name: str, encoder: str, n_check: int = 8,
) -> dict:
    """§2 spot-check: cosine(our image embedding, HF torch embedding) >=
    0.99 on sample items — catches checkpoint-file mix-ups. Runs only when
    the torch-side HF model class can load the SAME checkpoint dir
    (clip-family); otherwise records why it was skipped. Our towers
    compute bf16 by default (the reference's fp16-autocast equivalent), so
    the threshold absorbs the expected sub-1e-2 rounding."""
    if encoder not in ("clip",):
        return {
            "skipped": f"no offline torch-side loader for encoder={encoder} "
            "(open_clip checkpoint format); full-size architecture parity "
            "is covered by tests/test_towers_fullsize.py",
        }
    try:
        import pickle

        import numpy as np
        import torch
        from transformers import CLIPVisionModelWithProjection

        from outfitx_tpu.data.preprocess import load_image_uint8

        model = CLIPVisionModelWithProjection.from_pretrained(str(towers))
        model.eval()
        shard = sorted(
            shard_dir.glob(f"{model_name}_embedding_subset_*.pkl")
        )[0]
        with open(shard, "rb") as f:
            payload = pickle.load(f)
        ids = payload["ids"][:n_check]
        ours = np.asarray(payload["embeddings"][:n_check])
        d_half = ours.shape[1] // 2
        size = model.config.image_size
        cos = []
        for iid, mine in zip(ids, ours):
            img = load_image_uint8(str(ds / "images" / f"{int(iid)}.jpg"), size)
            x = torch.from_numpy(
                (img[None].astype("float32") / 255.0 - 0.5) / 0.5
            )
            with torch.no_grad():
                theirs = model(pixel_values=x).image_embeds[0].numpy()
            theirs = theirs / np.linalg.norm(theirs)
            img_half = mine[:d_half] / max(np.linalg.norm(mine[:d_half]), 1e-9)
            cos.append(float(np.dot(img_half, theirs)))
        return {"ok": min(cos) >= 0.99, "cosines": [round(c, 4) for c in cos]}
    except Exception as e:  # noqa: BLE001 — record, don't abort the run
        return {"skipped": f"{type(e).__name__}: {e}"}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset-dir", default=None)
    ap.add_argument("--weights", default=None, help="pretrained tower dir")
    ap.add_argument(
        "--encoder", default="siglip",
        choices=["siglip", "clip", "resnet_sbert"],
    )
    ap.add_argument("--polyvore-type", default="nondisjoint")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--out", default=str(REPO / "PARITY_RESULTS.json"))
    ap.add_argument(
        "--smoke", action="store_true",
        help="generate a synthetic disk dataset (with images) and run the "
        "whole pipeline shrunk — validates every step without downloads",
    )
    ap.add_argument("--skip-pes", action="store_true",
                    help="reuse existing embedding shards")
    ap.add_argument("--pes-shards", type=int, default=1,
                    help="pes --shards N for large catalogs")
    args = ap.parse_args()

    from outfitx_tpu.core.config import ItemEncoderConfig, OutfitXConfig

    model_cfg = OutfitXConfig(
        item_encoder=ItemEncoderConfig.for_type(args.encoder)
    )
    model_name = model_cfg.model_name

    t0 = time.time()
    results: dict = {
        "mode": "smoke" if args.smoke else "real",
        "encoder": args.encoder,
        "model_name": model_name,
        "steps": {},
    }

    ds = pathlib.Path(args.dataset_dir or "/tmp/parity_polyvore")
    ck = pathlib.Path(
        args.checkpoint_dir or ("/tmp/parity_ckpt" if args.smoke else "checkpoints")
    )
    if args.smoke and not (ds / "item_metadata.json").exists():
        print(f"[smoke] generating synthetic Polyvore at {ds}", flush=True)
        subprocess.run(
            [
                sys.executable, "scripts/make_synthetic_polyvore.py",
                "--out", str(ds), "--items", "4000", "--outfits", "2048",
                # images for a 256-item slice: pes sweeps exactly the items
                # WITH images (the real-data path), training uses the full
                # planted-embedding catalog so CP actually learns in smoke
                "--image-size", "64", "--image-items", "256",
                "--d-embed", str(model_cfg.d_embed),
                "--model-name", model_name,
            ],
            cwd=str(REPO), check=True,
        )

    # 1. layout ---------------------------------------------------------
    results["steps"]["layout"] = lay = check_layout(ds, args.polyvore_type)
    if not lay["ok"]:
        _finish(args.out, results, t0, ok=False)
        return

    # 2. tokenizer ------------------------------------------------------
    if args.weights:
        results["steps"]["tokenizer"] = tok = check_tokenizer(
            pathlib.Path(args.weights), args.encoder
        )
        if not tok["ok"] and not args.smoke:
            _finish(args.out, results, t0, ok=False)
            return
    else:
        results["steps"]["tokenizer"] = {
            "skipped": "no --weights (random-init towers; smoke only)"
        }

    # 3. precompute + spot-checks ---------------------------------------
    if args.skip_pes:
        results["steps"]["pes"] = {"skipped": "--skip-pes"}
    else:
        # smoke trains on the dataset's planted-signal shards; the pes
        # sweep (the real-data path) runs into a side dir so the
        # spot-checks still exercise decode -> towers -> shard write
        pes_out = ds / ("pes_check" if args.smoke else "precomputed_embeddings")
        pes_args = [
            "pes", "--dataset-dir", str(ds), "--encoder", args.encoder,
            "--batch-size", "256" if args.smoke else "2048",
            "--output-dir", str(pes_out),
        ]
        if args.weights:
            pes_args += ["--weights", args.weights]
        if args.pes_shards > 1:
            pes_args += ["--shards", str(args.pes_shards)]
        results["steps"]["pes"] = run_cli(pes_args)
        results["steps"]["shards"] = check_shards(
            pes_out, ds, model_name, model_cfg.d_embed
        )
        if args.weights:
            # spot-check the TOWER-computed shards (in smoke these live in
            # the pes_check side dir; training keeps the planted shards)
            results["steps"]["hf_cosine"] = check_hf_cosine(
                pes_out, ds, pathlib.Path(args.weights),
                model_name, args.encoder,
            )

    # 4. the chain ------------------------------------------------------
    common = [
        "--dataset-dir", str(ds), "--polyvore-type", args.polyvore_type,
        "--checkpoint-dir", str(ck), "--encoder", args.encoder,
    ]
    if args.smoke:
        cp_args = ["cp", "--epochs", "3", "--batch-size", "512",
                   "--lr", "3e-4"]
        cir_args = ["cir", "--epochs", "2", "--batch-size", "512",
                    "--lr", "3e-4", "--switch-to-hard-epoch", "1",
                    "--pool-threshold", "1"]
    else:
        # the exact reference envelope (PARITY.md §3; reference
        # compatibility_prediction_train_config.py:9-18,
        # complementary_item_retrieval_train_config.py:16-19)
        cp_args = ["cp", "--epochs", "200", "--batch-size", "3072",
                   "--remat", "--save-every", "10"]
        cir_args = ["cir", "--epochs", "300", "--batch-size", "512",
                    "--remat", "--save-every", "10"]
    results["steps"]["cp_train"] = run_cli(cp_args + common)
    results["steps"]["cir_train"] = run_cli(
        cir_args + common
        + ["--warm-start-from", str(ck / f"{model_name}-cp" / "best_auc")]
    )
    results["steps"]["fitb_test"] = run_cli(
        ["fitb"] + common
        + ["--checkpoint-from",
           str(ck / f"{model_name}-cir" / "best_recall@1")]
    )

    # 5. held-out test evals from the best checkpoints ------------------
    results["steps"]["cp_test"] = run_cli(
        ["cp", "--mode", "test",
         "--resume", str(ck / f"{model_name}-cp" / "best_auc")] + common
    )
    results["steps"]["cir_test"] = run_cli(
        ["cir", "--mode", "test",
         "--resume", str(ck / f"{model_name}-cir" / "best_recall@1")]
        + common
        + (["--pool-threshold", "1"] if args.smoke else [])
    )

    # 6. envelope comparison (§4) ---------------------------------------
    cp_auc = results["steps"]["cp_test"].get("auc")
    fitb_acc = results["steps"]["fitb_test"].get("accuracy")
    r10 = results["steps"]["cir_test"].get("recall@10")
    lo, hi = ENVELOPES["cp_auc"]
    flo, fhi = ENVELOPES["fitb_accuracy"]
    rnd = ENVELOPES["cir_recall@10_random"]
    results["envelope"] = {
        "cp_auc": cp_auc,
        "cp_auc_envelope": [lo, hi],
        "cp_auc_in_envelope": cp_auc is not None and lo <= cp_auc <= hi,
        "fitb_accuracy": fitb_acc,
        "fitb_envelope": [flo, fhi],
        "fitb_in_envelope": fitb_acc is not None and flo <= fitb_acc <= fhi,
        "cir_recall@10": r10,
        "cir_recall@10_random": rnd,
        "cir_recall@10_vs_random": (
            round(r10 / rnd, 1) if r10 is not None else None
        ),
        "note": (
            "smoke mode: envelope flags are informational (synthetic "
            "planted-signal data saturates CP and is not Polyvore)"
            if args.smoke
            else "envelopes from arXiv:2204.04812 Table 1 (PARITY.md §4)"
        ),
    }
    pipeline_ok = all(
        step.get("ok", True)
        for step in results["steps"].values()
        if isinstance(step, dict) and "skipped" not in step
    )
    _finish(args.out, results, t0, ok=pipeline_ok)


def _finish(out_path, results, t0, *, ok: bool) -> None:
    results["ok"] = ok
    results["seconds"] = round(time.time() - t0, 1)
    pathlib.Path(out_path).write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))
    print(f"PARITY {'OK' if ok else 'FAILED'} -> {out_path}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
