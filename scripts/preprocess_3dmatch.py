#!/usr/bin/env python
"""Offline 3DMatch preprocessing — emits the pickles the train/val loader
consumes (deepsir_tpu/data/threedmatch.py).

Equivalent behavior to the reference's dataloader/3DMatch_preprocess.py:
  1. load every fragment ply per scene/seq, voxel-downsample, align by its
     .pose.npy, store points in 3DMatch_{split}_{voxel:.3f}_points.pkl
  2. per scene, for every fragment pair compute the overlap ratio =
     fraction of anchor points whose nearest neighbour in the positive
     fragment lies within the voxel size (the reference uses cv2 BFMatcher
     1-NN + distance threshold, 3DMatch_preprocess.py:84-89 — identical
     semantics via the native kd-tree), keep pairs with ratio > 0.3, and
     write ..._overlap.pkl and ..._keypts.pkl

Usage:
  python scripts/preprocess_3dmatch.py --root <raw plys> --save <out dir>
         [--split train] [--voxel 0.03]
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepsir_tpu import native                          # noqa: E402
from deepsir_tpu.data.threedmatch import read_ply_xyz   # noqa: E402
from deepsir_tpu.math import se3_np                     # noqa: E402
from deepsir_tpu.ops.voxel import voxel_downsample_np   # noqa: E402

OVERLAP_THRESH = 0.3


def nn_matches(anc: np.ndarray, pos: np.ndarray, radius: float) -> np.ndarray:
    """1-NN matches within radius: [(anchor idx, positive idx), ...]."""
    if native.available():
        idx, sq = native.knn_search(anc, pos, 1)
        idx, sq = idx[:, 0], sq[:, 0]
    else:
        from scipy.spatial import cKDTree
        d, idx = cKDTree(pos).query(anc, k=1)
        sq = d * d
    keep = sq < radius * radius
    anchors = np.nonzero(keep)[0].astype(np.int32)
    return np.stack([anchors, idx[keep].astype(np.int32)], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="raw fragment ply root")
    ap.add_argument("--save", required=True, help="output pickle dir")
    ap.add_argument("--split", default="train", choices=["train", "val"])
    ap.add_argument("--voxel", type=float, default=0.03)
    args = ap.parse_args()
    os.makedirs(args.save, exist_ok=True)

    with open(os.path.join(args.root, f"scene_list_{args.split}.txt")) as f:
        scenes = [s.strip() for s in f if s.strip()]

    ids_list, scene_to_ids = [], {}
    for scene in scenes:
        scene_to_ids[scene] = []
        for seq in sorted(os.listdir(os.path.join(args.root, scene))):
            if not seq.startswith("seq"):
                continue
            seq_dir = os.path.join(args.root, scene, seq)
            ids = sorted(
                (f"{scene}/{seq}/{fn[:-4]}" for fn in os.listdir(seq_dir)
                 if fn.endswith(".ply")),
                key=lambda x: int(x.split("_")[-1]))
            ids_list += ids
            scene_to_ids[scene] += ids
    print(f"{len(scenes)} scenes, {len(ids_list)} fragments")

    # ---- pass 1: aligned downsampled points --------------------------------
    pts_file = os.path.join(args.save,
                            f"3DMatch_{args.split}_{args.voxel:.3f}_points.pkl")
    if os.path.exists(pts_file):
        with open(pts_file, "rb") as f:
            pts = pickle.load(f)
        print(f"reloaded {pts_file}")
    else:
        pts = {}
        for i, frag_id in enumerate(ids_list):
            cloud = read_ply_xyz(os.path.join(args.root, f"{frag_id}.ply"))
            cloud = voxel_downsample_np(cloud, args.voxel)
            pose = np.load(os.path.join(args.root, f"{frag_id}.pose.npy"))
            pts[frag_id] = se3_np.transform(pose, cloud).astype(np.float64)
            if i % 50 == 0:
                print(f"ply {i}/{len(ids_list)}")
        with open(pts_file, "wb") as f:
            pickle.dump(pts, f)

    # ---- pass 2: pairwise overlap + keypoint matches ----------------------
    overlap, keypts = {}, {}
    t0 = time.time()
    for scene, sids in scene_to_ids.items():
        print(f"scene {scene}: {len(sids)} fragments")
        # one float32 copy per fragment, reused across all O(F^2) pairings
        f32 = {sid: pts[sid].astype(np.float32) for sid in sids}
        for i in range(len(sids)):
            anc = f32[sids[i]]
            for j in range(i + 1, len(sids)):
                pos = f32[sids[j]]
                matches = nn_matches(anc, pos, args.voxel)
                ratio = len(matches) / max(len(anc), 1)
                if ratio > OVERLAP_THRESH:
                    key = f"{sids[i]}@{sids[j]}"
                    overlap[key] = ratio
                    keypts[key] = matches
        print(f"  done in {time.time() - t0:.1f}s; kept {len(overlap)} pairs")

    with open(os.path.join(
            args.save, f"3DMatch_{args.split}_{args.voxel:.3f}_overlap.pkl"),
            "wb") as f:
        pickle.dump(overlap, f)
    with open(os.path.join(
            args.save, f"3DMatch_{args.split}_{args.voxel:.3f}_keypts.pkl"),
            "wb") as f:
        pickle.dump(keypts, f)
    print("wrote overlap + keypts pickles")


if __name__ == "__main__":
    main()
