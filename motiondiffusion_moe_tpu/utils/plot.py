"""3D stick-figure motion rendering.

Capability match of ``text2motion/utils/plot_script.py:26-115``
(``plot_3d_motion``: matplotlib FuncAnimation GIF with floor plane and root
trajectory trace) and ``utils/utils.py:125-130``
(``motion_temporal_filter``: per-channel Gaussian smoothing).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def motion_temporal_filter(motion: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """Gaussian-smooth each channel along time (``utils/utils.py:125-130``)."""
    from scipy.ndimage import gaussian_filter1d

    prev_shape = motion.shape
    motion = motion.reshape(motion.shape[0], -1)
    out = np.stack(
        [gaussian_filter1d(motion[:, i], sigma, mode="nearest")
         for i in range(motion.shape[1])], axis=1)
    return out.reshape(prev_shape)


def plot_3d_motion(save_path: str, kinematic_tree: Sequence[Sequence[int]],
                   joints: np.ndarray, title: str = "",
                   figsize=(10, 10), fps: int = 20, radius: float = 4.0) -> None:
    """Render [T, J, 3] joints to an animated GIF
    (``plot_script.py:26-115``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation
    from mpl_toolkits.mplot3d import Axes3D  # noqa: F401

    data = np.asarray(joints, dtype=np.float64).copy()
    frame_number = data.shape[0]

    # normalize like the reference: floor at min height, root-centered XZ
    MINS = data.min(axis=0).min(axis=0)
    MAXS = data.max(axis=0).max(axis=0)
    height_offset = MINS[1]
    data[:, :, 1] -= height_offset
    trajec = data[:, 0, [0, 2]].copy()
    data[..., 0] -= data[:, 0:1, 0]
    data[..., 2] -= data[:, 0:1, 2]

    colors = ["red", "blue", "black", "red", "blue",
              "darkblue", "darkblue", "darkblue", "darkblue", "darkblue"]

    fig = plt.figure(figsize=figsize)
    ax = fig.add_subplot(111, projection="3d")

    def init():
        ax.set_xlim3d([-radius / 2, radius / 2])
        ax.set_ylim3d([0, radius])
        ax.set_zlim3d([0, radius])
        ax.grid(b=False) if hasattr(ax, "grid") else None
        fig.suptitle(title, fontsize=20)

    def plot_xz_plane(minx, maxx, miny, minz, maxz):
        verts = [[minx, miny, minz], [minx, miny, maxz],
                 [maxx, miny, maxz], [maxx, miny, minz]]
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        plane = Poly3DCollection([verts])
        plane.set_facecolor((0.5, 0.5, 0.5, 0.5))
        ax.add_collection3d(plane)

    def update(index):
        ax.clear()
        ax.set_xlim3d([-radius / 2, radius / 2])
        ax.set_ylim3d([0, radius])
        ax.set_zlim3d([0, radius])
        ax.view_init(elev=120, azim=-90)
        ax.dist = 7.5
        plot_xz_plane(MINS[0] - trajec[index, 0], MAXS[0] - trajec[index, 0],
                      0, MINS[2] - trajec[index, 1],
                      MAXS[2] - trajec[index, 1])
        # root trajectory trace
        if index > 1:
            ax.plot3D(trajec[:index, 0] - trajec[index, 0],
                      np.zeros_like(trajec[:index, 0]),
                      trajec[:index, 1] - trajec[index, 1],
                      linewidth=1.0, color="blue")
        for i, (chain, color) in enumerate(zip(kinematic_tree, colors)):
            linewidth = 4.0 if i < 5 else 2.0
            ax.plot3D(data[index, chain, 0], data[index, chain, 1],
                      data[index, chain, 2], linewidth=linewidth, color=color)
        plt.axis("off")
        ax.set_xticklabels([])
        ax.set_yticklabels([])
        ax.set_zticklabels([])

    ani = FuncAnimation(fig, update, frames=frame_number,
                        interval=1000 / fps, repeat=False, init_func=init)
    ani.save(save_path, fps=fps)
    plt.close(fig)
