"""Generate a complete synthetic Polyvore-layout dataset on disk.

Writes every file the reference's loaders expect (SURVEY.md 2.3):
item_metadata.json, categories.json, precomputed_embeddings shards,
{type}/{mode}.json (CIR outfits), {type}/compatibility/{mode}.json,
{type}/fill_in_the_blank/{mode}.json — with a planted style signal so
training is learnable. Embeddings are written as shards exactly as the
precompute sweep would produce them, so `Catalog.from_polyvore` and every
CLI command run in real --dataset-dir mode end to end:

    python scripts/make_synthetic_polyvore.py --out /tmp/polyvore
    python -m outfitx_tpu.cli cp  --dataset-dir /tmp/polyvore ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json
import pathlib
import pickle

import numpy as np


def generate(
    out,
    *,
    items: int = 20_000,
    d_embed: int = 1536,
    outfits: int = 8_000,
    cir_outfits: int = 0,  # 0: same as outfits (CP and CIR splits sized alike)
    categories: int = 0,  # 0: auto (few categories, all pool-eligible)
    model_name: str = "outfitx-tpu-siglip-d1536",
    seed: int = 0,
    image_size: int = 0,  # >0: also write images/{id}.jpg at this size
    image_items: int = 0,  # >0: write images for only the first N items
):
    import types

    args = types.SimpleNamespace(
        items=items, d_embed=d_embed, outfits=outfits,
        model_name=model_name, seed=seed, image_size=image_size,
        image_items=image_items,
    )
    rng = np.random.default_rng(args.seed)
    out = pathlib.Path(out)
    (out / "precomputed_embeddings").mkdir(parents=True, exist_ok=True)
    t = out / "nondisjoint"
    (t / "compatibility").mkdir(parents=True, exist_ok=True)
    (t / "fill_in_the_blank").mkdir(exist_ok=True)

    n, d = args.items, args.d_embed
    # few categories so each clears the reference's >=3000-item
    # large-category threshold for CIR eval (SURVEY.md 2.3)
    n_styles = 24
    n_cats = categories or max(2, min(6, args.items // 3500))
    sem_names = ["tops", "bottoms", "shoes", "bags", "outerwear", "jewellery"]
    styles = rng.standard_normal((n_styles, d)).astype(np.float32)
    item_style = rng.integers(0, n_styles, n)
    emb = styles[item_style] + 0.5 * rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    category_id = rng.integers(0, n_cats, n)
    ids = (500_000 + np.arange(n)).tolist()

    metadata = [
        {
            "item_id": ids[i],
            "url_name": f"item {i}",
            "description": "",
            "title": f"synthetic item {i}",
            "category_id": int(category_id[i]),
            "semantic_category": sem_names[int(category_id[i]) % len(sem_names)],
        }
        for i in range(n)
    ]
    (out / "item_metadata.json").write_text(json.dumps(metadata))
    (out / "categories.json").write_text(
        json.dumps({str(c): f"category {c}" for c in range(n_cats)})
    )

    # embedding shards, two ranks, exactly the precompute output format
    half = n // 2
    for rank, sl in enumerate([slice(0, half), slice(half, n)]):
        with open(
            out / "precomputed_embeddings"
            / f"{args.model_name}_embedding_subset_{rank}.pkl",
            "wb",
        ) as f:
            pickle.dump({"ids": ids[sl], "embeddings": emb[sl]}, f)

    by_style = [np.flatnonzero(item_style == s) for s in range(n_styles)]

    def coherent(length):
        s = int(rng.integers(n_styles))
        length = min(length, len(by_style[s]))  # tiny test datasets
        rows = rng.choice(by_style[s], size=length, replace=False)
        return [ids[r] for r in rows]

    def incoherent(length):
        return [ids[r] for r in rng.choice(n, size=length, replace=False)]

    def cp_rows(count):
        rows = []
        for i in range(count):
            length = int(rng.integers(4, 12))
            lab = i % 2
            rows.append(
                {"label": lab, "question": coherent(length) if lab else incoherent(length)}
            )
        return rows

    def outfit_rows(count):
        return [
            {"item_ids": coherent(int(rng.integers(4, 12)))} for _ in range(count)
        ]

    def fitb_rows(count):
        rows = []
        for i in range(count):
            members = coherent(int(rng.integers(4, 10)))
            answer = members.pop()
            wrong = [ids[r] for r in rng.choice(n, size=3, replace=False)]
            cands = wrong + [answer]
            perm = rng.permutation(4)
            rows.append(
                {
                    "question": members,
                    "answers": [cands[p] for p in perm],
                    "label": int(np.argwhere(perm == 3)[0, 0]),
                }
            )
        return rows

    n_cir = cir_outfits or args.outfits
    for mode, cnt, cir_cnt in [
        ("train", args.outfits, n_cir),
        ("valid", args.outfits // 8, n_cir // 8),
        ("test", args.outfits // 8, n_cir // 8),
    ]:
        (t / "compatibility" / f"{mode}.json").write_text(json.dumps(cp_rows(cnt)))
        (t / f"{mode}.json").write_text(json.dumps(outfit_rows(cir_cnt)))
    (t / "fill_in_the_blank" / "test.json").write_text(
        json.dumps(fitb_rows(args.outfits // 8))
    )
    if args.image_size:
        from PIL import Image

        (out / "images").mkdir(exist_ok=True)
        s_img = args.image_size
        # image_items bounds the jpg count: precompute sweeps only items
        # WITH images, so a smoke run can exercise the image->tower path
        # on a slice while training uses the full planted-embedding catalog
        n_img = n if not getattr(args, "image_items", 0) else min(
            n, args.image_items
        )
        for i in range(n_img):
            # style-colored noise so the image carries the planted signal
            base = np.full((s_img, s_img, 3), 0, dtype=np.int16)
            base[..., 0] = int(80 + 170 * (item_style[i] / n_styles))
            base[..., 1] = int(80 + 170 * ((item_style[i] * 7) % n_styles) / n_styles)
            noise = rng.integers(-40, 40, (s_img, s_img, 3), dtype=np.int16)
            arr = np.clip(base + noise, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(out / "images" / f"{ids[i]}.jpg")
    print(
        f"wrote synthetic polyvore to {out}: {n} items, "
        f"{args.outfits} outfits/split"
        + (f", images@{args.image_size}px" if args.image_size else "")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--items", type=int, default=20_000)
    ap.add_argument("--d-embed", type=int, default=1536)
    ap.add_argument("--outfits", type=int, default=8_000)
    ap.add_argument("--cir-outfits", type=int, default=0)
    ap.add_argument("--categories", type=int, default=0)
    ap.add_argument("--model-name", default="outfitx-tpu-siglip-d1536")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--image-size", type=int, default=0)
    ap.add_argument("--image-items", type=int, default=0)
    args = ap.parse_args()
    generate(
        args.out, items=args.items, d_embed=args.d_embed,
        outfits=args.outfits, cir_outfits=args.cir_outfits,
        categories=args.categories, model_name=args.model_name,
        seed=args.seed, image_size=args.image_size,
        image_items=args.image_items,
    )


if __name__ == "__main__":
    main()
