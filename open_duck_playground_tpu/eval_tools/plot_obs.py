"""Plot saved observation traces (sim-vs-real debugging, the
plot_saved_obs.py role in the reference). Layout documentation doubles as the
deployed obs-vector spec.

Obs layout for the joystick policy (state, 101 dims for nu=14):
    [0:3)    gyro (rad/s)
    [3:6)    accelerometer (m/s^2, +1.3 x-offset applied on the eval path)
    [6:13)   command (vx, vy, wz, neck_pitch, head_pitch, head_yaw, head_roll)
    [13:27)  joint angles - default pose (rad)
    [27:41)  joint velocities * 0.05
    [41:55)  last action
    [55:69)  last last action
    [69:83)  last last last action
    [83:97)  motor targets
    [97:99)  foot contacts (L, R)
    [99:101) imitation phase (cos, sin)
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np

SECTIONS = [
    ("gyro", 0, 3),
    ("accelerometer", 3, 6),
    ("command", 6, 13),
    ("joint_angles_delta", 13, 27),
    ("joint_vel_scaled", 27, 41),
    ("last_action", 41, 55),
    ("last_last_action", 55, 69),
    ("last_last_last_action", 69, 83),
    ("motor_targets", 83, 97),
    ("contacts", 97, 99),
    ("imitation_phase", 99, 101),
]


def load_obs(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return np.asarray(pickle.load(f))


def plot(paths, out: str | None = None):
    import matplotlib

    if out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    traces = {p: load_obs(p) for p in paths}
    nsec = len(SECTIONS)
    ncols = 3
    nrows = (nsec + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(16, 3 * nrows))
    for ax, (name, a, b) in zip(axes.ravel(), SECTIONS):
        for path, obs in traces.items():
            ax.plot(obs[:, a:b], alpha=0.7)
        ax.set_title(name)
    for ax in axes.ravel()[nsec:]:
        ax.axis("off")
    fig.tight_layout()
    if out:
        fig.savefig(out, dpi=120)
        print(f"saved {out}")
    else:
        plt.show()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("obs_pickles", nargs="+", help="mujoco_saved_obs.pkl paths")
    p.add_argument("--out", default=None, help="write PNG instead of showing")
    args = p.parse_args(argv)
    plot(args.obs_pickles, args.out)


if __name__ == "__main__":
    main()
