#!/usr/bin/env python
"""Build a photographic-statistics training corpus from images baked into
the environment's site-packages (dm_control / gymnasium_robotics / labmaze
textures, matplotlib's grace_hopper photo, ...).

The reference trains on OpenImages (no such dataset ships in this
container).  These package assets are real photographic textures (wood,
marble, skin, grass, skyboxes) plus a couple of actual photos — natural
enough statistics for a learned lossless codec to move well past the
synthetic-sinusoid noise floor and to let the estimate-vs-actual-rate
cross-check run on realistic data.

Deterministic: fixed scan roots, content filters, and a hash-ordered
train/valid/test split, so `python tools/build_corpus.py` rebuilds the
same corpus anywhere this container runs.  Outputs PNGs under
data_corpus/{train,valid,test}/ (not committed; regenerable).
"""
from __future__ import annotations

import argparse
import glob
import hashlib
import os
import sys

import numpy as np
from PIL import Image

SCAN_ROOTS = [
    "/opt/venv/lib/python3.12/site-packages",
]
EXTRA_FILES = [
    # A real photograph (test-set anchor).
    "/opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/"
    "sample_data/grace_hopper.jpg",
]
EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")

MIN_DIM = 192          # crops of patch_size 160 must fit without upscaling
MIN_BYTES = 20_000     # skip icons
MIN_STD = 12.0         # reject near-flat images
MIN_UNIQUE = 300       # reject palette/UI graphics (sampled unique colors)
MAX_MODE_FRAC = 0.5    # reject images dominated by one color

# Named holdout: the test set is chosen by content, not hash, so it always
# contains the most photograph-like images for the bpsp report.
TEST_NAMES = [
    "grace_hopper",            # real photo
    "imagenet",                # real photo collage (aqt)
    "skin_texture",            # dog skin photo texture
    "OutdoorGrassFloorD",      # grass photo texture
    "white_marble_tile2",      # marble photo texture
    "darkwood",                # wood photo texture
]
N_VALID = 12


def candidate_files():
    files = list(EXTRA_FILES)
    for root in SCAN_ROOTS:
        for p in glob.glob(os.path.join(root, "**", "*"), recursive=True):
            if p.lower().endswith(EXTS):
                files.append(p)
    return sorted(set(files))


def accept(path: str):
    try:
        if os.path.getsize(path) < MIN_BYTES:
            return None
        with Image.open(path) as im:
            rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
    except Exception:
        return None
    h, w = rgb.shape[:2]
    if min(h, w) < MIN_DIM:
        return None
    if rgb.std() < MIN_STD:
        return None
    rng = np.random.default_rng(0)
    idx = rng.integers(0, h * w, size=10_000)
    sample = rgb.reshape(-1, 3)[idx]
    colors, counts = np.unique(sample, axis=0, return_counts=True)
    if len(colors) < MIN_UNIQUE:
        return None
    if counts.max() / counts.sum() > MAX_MODE_FRAC:
        return None
    return rgb


def main(out_dir: str, n_synth: int = 64) -> int:
    per_split = {"train": [], "valid": [], "test": []}
    seen_content = set()
    seen_scene = set()
    entries = []
    for path in candidate_files():
        stem0 = os.path.splitext(os.path.basename(path))[0]
        if stem0.startswith("frame_"):
            # dm_control test renders: frames of one scene are near-identical
            # time steps — keep every 8th frame per scene directory
            try:
                fidx = int(stem0.split("_")[1])
            except (IndexError, ValueError):
                fidx = 0
            if fidx % 8 != 0:
                continue
            key = (os.path.dirname(path), fidx)
            if key in seen_scene:
                continue
            seen_scene.add(key)
        rgb = accept(path)
        if rgb is None:
            continue
        digest = hashlib.sha1(rgb.tobytes()).hexdigest()
        if digest in seen_content:  # identical assets ship in multiple pkgs
            continue
        seen_content.add(digest)
        stem = os.path.splitext(os.path.basename(path))[0]
        entries.append((digest, stem, rgb))

    # named test picks first
    rest = []
    for digest, stem, rgb in entries:
        if any(n == stem for n in TEST_NAMES):
            per_split["test"].append((digest, stem, rgb))
        else:
            rest.append((digest, stem, rgb))
    rest.sort(key=lambda e: e[0])  # hash order = deterministic shuffle
    per_split["valid"] = rest[:N_VALID]
    per_split["train"] = rest[N_VALID:]

    for split, items in per_split.items():
        d = os.path.join(out_dir, split)
        os.makedirs(d, exist_ok=True)
        for digest, stem, rgb in items:
            out = os.path.join(d, f"{stem}_{digest[:8]}.png")
            if not os.path.exists(out):
                Image.fromarray(rgb).save(out, optimize=False)
        print(f"{split}: {len(items)} images")

    # Deterministic multi-octave synthetic augmentation (train only):
    # 1/f value-noise + edges + correlated chroma — adds volume/diversity
    # to the thin real-texture set.  valid/test stay fully real.
    if n_synth:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from llicti_tpu.data.dataset import synthetic_natural_image

        d = os.path.join(out_dir, "train")
        for i in range(n_synth):
            out = os.path.join(d, f"synth_octave_{i:03d}.png")
            if not os.path.exists(out):
                Image.fromarray(
                    synthetic_natural_image(512, 512, 7_777_000 + i)
                ).save(out, optimize=False)
        print(f"train += {n_synth} synthetic (multi-octave)")
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data_corpus")
    ap.add_argument("--synthetic", type=int, default=64,
                    help="multi-octave synthetic train images to add")
    args = ap.parse_args()
    sys.exit(main(args.out, args.synthetic))
