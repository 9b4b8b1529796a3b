"""Pose/transform validation script.

Equivalent of the reference's ``pose_checker.py``: load a dataset window,
print poses and relative transforms, and verify the identity
``T_12 = [R1^T R2 | R1^T (t2 - t1)]`` (reference ``pose_checker.py:57-82``)
against both the dataset-provided transforms and ``poses_to_transforms``.
"""

from __future__ import annotations

import numpy as np

from e2eslam_tpu.config import load_config
from e2eslam_tpu.core.se3 import poses_to_transforms
from e2eslam_tpu.data.pipeline import load_batch, make_dataset


def check(config, *, verbose=True) -> float:
    dataset = make_dataset(config, sequence_length=2)
    _, _, _, poses, transforms = load_batch(dataset, [0])
    poses, transforms = np.asarray(poses[0]), np.asarray(transforms[0])

    P1, P2 = poses[0], poses[1]
    R1, t1 = P1[:3, :3], P1[:3, 3]
    R2, t2 = P2[:3, :3], P2[:3, 3]
    manual = np.eye(4, dtype=np.float64)
    manual[:3, :3] = R1.T @ R2
    manual[:3, 3] = R1.T @ (t2 - t1)

    computed = np.asarray(poses_to_transforms(poses))[1]
    err_dataset = float(np.abs(transforms[1] - manual).max())
    err_computed = float(np.abs(computed - manual).max())

    if verbose:
        print("pose 1:\n", P1)
        print("pose 2:\n", P2)
        print("dataset transform 1->2:\n", transforms[1])
        print("manual [R1^T R2 | R1^T (t2-t1)]:\n", manual)
        print(f"max |dataset - manual|  = {err_dataset:.2e}")
        print(f"max |computed - manual| = {err_computed:.2e}")
    return max(err_dataset, err_computed)


def main(argv=None):
    config = load_config(argv)
    err = check(config)
    ok = err < 1e-4
    print("PASS" if ok else "FAIL", f"(max err {err:.2e})")
    return err


if __name__ == "__main__":
    main()
