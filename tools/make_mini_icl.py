"""Generate the checked-in mini ICL-format sequence (tests/data/ICL/...).

Renders the procedural synthetic scene at the REAL ICL camera geometry
(640x480, fx=481.20 fy=-480.0 cx=319.5 cy=239.5 — the loader's native
intrinsics) and writes it in the exact on-disk ICL layout the reference's
gradslam loader consumes (rgb/<i>.png, depth/<i>.png uint16 = meters*5000,
livingRoom0.gt.freiburg pose file).

The CONTENT is synthetic (no network egress in this environment to fetch a
real trajectory); what this fixture buys is end-to-end coverage of the REAL
data path: PNG decode via the native C++ loader, resize + intrinsics
rescale, freiburg pose parsing, windowing — feeding the full adaptation
stack. Re-run this script only to regenerate the fixture.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from e2eslam_tpu.data.synthetic import _pose, _render

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "ICL", "living_room_traj0_frei_png")
N_FRAMES = 10
DT = 0.16  # brisk motion so keyframe selection fires at threshold 0.03

K_NATIVE = np.array(
    [[481.20, 0, 319.5], [0, -480.0, 239.5], [0, 0, 1]], np.float64
)


def rot_to_quat(R):
    """Rotation matrix -> (qx, qy, qz, qw)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        qw = 0.25 * s
        qx = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 2] - R[2, 0]) / s
        qz = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
        q = np.empty(4)
        q[i] = 0.25 * s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        q[3] = (R[k, j] - R[j, k]) / s
        qx, qy, qz, qw = q
    return qx, qy, qz, qw


def main():
    os.makedirs(os.path.join(OUT, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(OUT, "depth"), exist_ok=True)
    lines = []
    for i in range(N_FRAMES):
        pose = _pose(i * DT)
        color, depth = _render(pose, K_NATIVE, 480, 640)
        rgb8 = (np.clip(color, 0, 1) * 255).astype(np.uint8)
        d16 = np.clip(depth[..., 0] * 5000.0, 0, 65535).astype(np.uint16)
        Image.fromarray(rgb8).save(os.path.join(OUT, "rgb", f"{i}.png"))
        Image.fromarray(d16, mode="I;16").save(
            os.path.join(OUT, "depth", f"{i}.png")
        )
        qx, qy, qz, qw = rot_to_quat(pose[:3, :3])
        tx, ty, tz = pose[:3, 3]
        lines.append(
            f"{i} {tx:.6f} {ty:.6f} {tz:.6f} "
            f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}\n"
        )
    with open(os.path.join(OUT, "livingRoom0.gt.freiburg"), "w") as f:
        f.writelines(lines)
    total = sum(
        os.path.getsize(os.path.join(dp, fn))
        for dp, _, fns in os.walk(OUT) for fn in fns
    )
    print(f"wrote {N_FRAMES} frames to {OUT} ({total/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
