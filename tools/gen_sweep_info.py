#!/usr/bin/env python
"""Augment mmdet3d nuScenes info pkls with per-camera sweep entries
(pose, intrinsics, timestamps) — producing the ``*_sweep.pkl`` files the
datasets consume (reference /root/reference/gen_sweep_info.py:18-112:
5 sweeps interpolated between consecutive keyframes).

Requires the nuScenes devkit + raw dataset (host-side, one-off data prep).
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CAM_TYPES = [
    "CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
    "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT",
]
NUM_SWEEPS_BETWEEN = 5


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-root", default="data/nuscenes")
    parser.add_argument("--version", default="v1.0-trainval",
                        choices=["v1.0-trainval", "v1.0-test", "v1.0-mini"])
    return parser.parse_args()


def get_cam_info(nusc, cam_token):
    """Per-camera sweep record: path, timestamp, global pose, intrinsics."""
    from sparsebev_tpu.data.box3d import quaternion_to_rotation_matrix
    sd = nusc.get("sample_data", cam_token)
    cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
    pose = nusc.get("ego_pose", sd["ego_pose_token"])

    sensor2ego_r = quaternion_to_rotation_matrix(cs["rotation"])
    ego2global_r = quaternion_to_rotation_matrix(pose["rotation"])
    sensor2global_r = ego2global_r @ sensor2ego_r
    sensor2global_t = (np.asarray(cs["translation"]) @ ego2global_r.T
                       + np.asarray(pose["translation"]))
    return dict(
        data_path=os.path.join(nusc.dataroot, sd["filename"]),
        timestamp=sd["timestamp"],
        sensor2global_rotation=sensor2global_r,
        sensor2global_translation=sensor2global_t,
        cam_intrinsic=np.asarray(cs["camera_intrinsic"]),
    )


def add_sweep_info(nusc, infos):
    """For each keyframe, record NUM_SWEEPS_BETWEEN evenly-spaced non-keyframe
    camera sets between it and the previous keyframe."""
    token2idx = {info["token"]: i for i, info in enumerate(infos)}
    for info in infos:
        sample = nusc.get("sample", info["token"])
        sweeps = []
        # walk each camera's sample_data chain backwards until the previous
        # keyframe, collecting intermediate (non-key) frames
        chains = {}
        for cam in CAM_TYPES:
            chain = []
            sd_token = sample["data"][cam]
            sd = nusc.get("sample_data", sd_token)
            tok = sd["prev"]
            while tok:
                sd = nusc.get("sample_data", tok)
                if sd["is_key_frame"]:
                    break
                chain.append(tok)
                tok = sd["prev"]
            chains[cam] = chain  # newest -> oldest

        n = min((len(c) for c in chains.values()), default=0)
        if n == 0:
            info["sweeps"] = []
            continue
        picks = np.linspace(0, n - 1, min(NUM_SWEEPS_BETWEEN, n)).astype(int)
        for k in picks:
            sweeps.append({cam: get_cam_info(nusc, chains[cam][k])
                           for cam in CAM_TYPES})
        info["sweeps"] = sweeps  # newest first (matching collect_sweeps walk)
    return infos


def main():
    args = parse_args()
    try:
        from nuscenes.nuscenes import NuScenes
    except ImportError:
        print("ERROR: nuscenes-devkit is required for sweep-info generation "
              "(host-side data prep); install it where the raw dataset lives.",
              file=sys.stderr)
        sys.exit(1)

    nusc = NuScenes(version=args.version, dataroot=args.data_root,
                    verbose=True)
    splits = (["train", "val"] if args.version == "v1.0-trainval"
              else ["test"] if args.version == "v1.0-test"
              else ["train_mini", "val_mini"])
    for split in splits:
        base = os.path.join(args.data_root,
                            f"nuscenes_infos_{split.replace('_mini', '')}.pkl")
        if not os.path.exists(base):
            print(f"skip {base} (not found)")
            continue
        with open(base, "rb") as f:
            data = pickle.load(f)
        infos = data["infos"] if isinstance(data, dict) else data
        infos = add_sweep_info(nusc, infos)
        out = base.replace(".pkl", "_sweep.pkl")
        with open(out, "wb") as f:
            pickle.dump(dict(infos=infos,
                             metadata=dict(version=args.version)), f)
        print(f"wrote {out} ({len(infos)} samples)")


if __name__ == "__main__":
    main()
