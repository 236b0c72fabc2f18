"""gen_sweep_info core logic against a devkit-shaped in-memory store.

The real nuScenes devkit + raw tree are not on this machine (zero egress),
but ``add_sweep_info``/``get_cam_info`` only touch the devkit through
``nusc.get(table, token)`` and ``nusc.dataroot`` — so the sweep-chain walk,
the evenly-spaced pick (5 between keyframes, reference
gen_sweep_info.py:18-112), the newest-first ordering and the
sensor->global pose composition are all testable with a synthesized store.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from gen_sweep_info import CAM_TYPES, add_sweep_info, get_cam_info  # noqa: E402


class FakeNusc:
    """Duck-typed stand-in for nuscenes.NuScenes: three tables + dataroot."""

    dataroot = "/data/nuscenes"

    def __init__(self):
        self.tables = {"sample": {}, "sample_data": {},
                       "calibrated_sensor": {}, "ego_pose": {}}

    def get(self, table, token):
        return self.tables[table][token]


def _quat_z(theta):
    return [np.cos(theta / 2), 0.0, 0.0, np.sin(theta / 2)]


def make_store(num_keyframes=3, gaps=(7, 7)):
    """Per camera: keyframes separated by ``gaps[i]`` non-key frames, linked
    newest->oldest via ``prev``. Returns (store, key sample tokens)."""
    nusc = FakeNusc()
    nusc.tables["calibrated_sensor"]["cs0"] = dict(
        rotation=_quat_z(0.1), translation=[1.0, 0.5, 1.6],
        camera_intrinsic=(np.diag([1266.0, 1266.0, 1.0])
                          + np.array([[0, 0, 800], [0, 0, 450], [0, 0, 0]])
                          ).tolist())
    t = 0
    sample_tokens = []
    prev_of_cam = {cam: "" for cam in CAM_TYPES}
    for k in range(num_keyframes):
        data = {}
        for cam in CAM_TYPES:
            if k > 0:
                for j in range(gaps[k - 1]):
                    tok = f"{cam}_k{k}_s{j}"
                    nusc.tables["ego_pose"][tok] = dict(
                        rotation=_quat_z(0.01 * t),
                        translation=[float(t), 0.0, 0.0])
                    nusc.tables["sample_data"][tok] = dict(
                        filename=f"sweeps/{cam}/{tok}.jpg",
                        timestamp=1_000_000 * t, is_key_frame=False,
                        calibrated_sensor_token="cs0", ego_pose_token=tok,
                        prev=prev_of_cam[cam])
                    prev_of_cam[cam] = tok
                    t += 1
            tok = f"{cam}_key{k}"
            nusc.tables["ego_pose"][tok] = dict(
                rotation=_quat_z(0.01 * t), translation=[float(t), 0.0, 0.0])
            nusc.tables["sample_data"][tok] = dict(
                filename=f"samples/{cam}/{tok}.jpg",
                timestamp=1_000_000 * t, is_key_frame=True,
                calibrated_sensor_token="cs0", ego_pose_token=tok,
                prev=prev_of_cam[cam])
            prev_of_cam[cam] = tok
            data[cam] = tok
        stok = f"sample{k}"
        nusc.tables["sample"][stok] = dict(data=data)
        sample_tokens.append(stok)
        t += 1
    return nusc, sample_tokens


def test_sweep_chain_walk_and_picks():
    nusc, toks = make_store()
    infos = [dict(token=tok) for tok in toks]
    out = add_sweep_info(nusc, infos)

    # first keyframe has no previous non-key frames
    assert out[0]["sweeps"] == []
    for info in out[1:]:
        sweeps = info["sweeps"]
        assert len(sweeps) == 5  # NUM_SWEEPS_BETWEEN of the 7 available
        for sw in sweeps:
            assert set(sw) == set(CAM_TYPES)
            for cam in CAM_TYPES:
                assert not nusc.tables["sample_data"][
                    os.path.basename(sw[cam]["data_path"]).split(".")[0]
                ]["is_key_frame"]
        # newest first: timestamps strictly decreasing
        ts = [sw["CAM_FRONT"]["timestamp"] for sw in sweeps]
        assert ts == sorted(ts, reverse=True)
        # evenly spaced over the 7-frame chain: picks 0,1,3,4,6
        chain_ts = sorted(
            (sd["timestamp"] for tok2, sd in nusc.tables["sample_data"].items()
             if tok2.startswith("CAM_FRONT_k1_s")), reverse=True)
        if info is out[1]:
            assert ts == [chain_ts[i] for i in [0, 1, 3, 4, 6]]


def test_cam_info_pose_composition():
    nusc, _ = make_store(num_keyframes=2, gaps=(1,))
    tok = "CAM_FRONT_k1_s0"
    info = get_cam_info(nusc, tok)
    from sparsebev_tpu.data.box3d import quaternion_to_rotation_matrix
    cs = nusc.tables["calibrated_sensor"]["cs0"]
    pose = nusc.tables["ego_pose"][tok]
    r_s2e = quaternion_to_rotation_matrix(cs["rotation"])
    r_e2g = quaternion_to_rotation_matrix(pose["rotation"])
    np.testing.assert_allclose(info["sensor2global_rotation"], r_e2g @ r_s2e,
                               atol=1e-12)
    np.testing.assert_allclose(
        info["sensor2global_translation"],
        np.asarray(cs["translation"]) @ r_e2g.T + np.asarray(pose["translation"]),
        atol=1e-12)
    assert info["data_path"].startswith(nusc.dataroot)
    np.testing.assert_allclose(info["cam_intrinsic"][0, 0], 1266.0)
