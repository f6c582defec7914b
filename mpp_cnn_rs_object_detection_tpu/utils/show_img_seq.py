"""Interactive image-stack sequence viewer.

Rebuild of reference ``utils/display/show_img_seq.py``: a keyboard-navigable
(left/right) frame stack over one or more matplotlib axes, the display
rendered by a user callback ``display_method(index, axs, data)``. Adds an
``export_frames`` path for headless environments (renders every frame to PNG
with the Agg backend — this image has no GUI toolkit).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence, Union


class ImageStackDisplay:
    """Attachable frame navigator (reference ``ImageStackDisplay``).

    ``axs`` is a single Axes or an ndarray of Axes; ``display_method`` draws
    frame ``index`` of ``plot_data_list`` onto them. Connect with
    ``fig.canvas.mpl_connect('key_press_event', viewer.key)``.
    """

    def __init__(self, axs, display_method: Callable, plot_data_list: List[Dict],
                 save_path: Optional[str] = None, save_prefix: str = "frame"):
        self.axs = axs
        self.data = plot_data_list
        self.n_frames = len(plot_data_list)
        self.ind = 0
        self.display_method = display_method
        self.save_path = save_path
        self.save_prefix = save_prefix
        self.update()

    def key(self, event):
        if event.key == "right":
            self.ind = min(self.ind + 1, self.n_frames - 1)
        elif event.key == "left":
            self.ind = max(self.ind - 1, 0)
        elif event.key == "e" and self.save_path is not None:
            fig = self._fig()
            fig.tight_layout()
            out = os.path.join(
                self.save_path, f"{self.save_prefix}_{self.ind:03}.png"
            )
            fig.savefig(out)
        self.update()

    def _fig(self):
        import numpy as np

        return (
            self.axs.ravel()[0].figure
            if isinstance(self.axs, np.ndarray)
            else self.axs.figure
        )

    def update(self):
        import numpy as np

        if isinstance(self.axs, np.ndarray):
            for ax in self.axs.ravel():
                ax.clear()
            self.display_method(self.ind, self.axs, self.data)
            self._fig().canvas.draw_idle()
        else:
            self.axs.clear()
            self.display_method(self.ind, self.axs, self.data)
            self.axs.figure.canvas.draw_idle()


def show_image_sequence(plot_data_list: List[Dict], display_method: Callable,
                        n_axes: Union[int, Sequence[int]] = 1,
                        save_path: Optional[str] = None):
    """Open the viewer (blocking) when a GUI backend exists; otherwise no-op
    and return None — use :func:`export_frames` headless."""
    import matplotlib
    import matplotlib.pyplot as plt
    import numpy as np

    if matplotlib.get_backend().lower() == "agg":
        return None
    if isinstance(n_axes, int):
        fig, axs = plt.subplots(1, n_axes, squeeze=n_axes == 1)
    else:
        fig, axs = plt.subplots(*n_axes)
    viewer = ImageStackDisplay(
        np.asarray(axs) if not hasattr(axs, "figure") else axs,
        display_method, plot_data_list, save_path=save_path,
    )
    fig.canvas.mpl_connect("key_press_event", viewer.key)
    plt.show()
    return viewer


def export_frames(plot_data_list: List[Dict], display_method: Callable,
                  out_dir: str, n_axes: Union[int, Sequence[int]] = 1,
                  prefix: str = "frame", dpi: int = 110) -> List[str]:
    """Headless equivalent: render every frame to ``out_dir/prefix_NNN.png``."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    if isinstance(n_axes, int):
        fig, axs = plt.subplots(1, n_axes, squeeze=n_axes == 1)
    else:
        fig, axs = plt.subplots(*n_axes)
    paths = []
    for i in range(len(plot_data_list)):
        if isinstance(axs, np.ndarray):
            for ax in axs.ravel():
                ax.clear()
        else:
            axs.clear()
        display_method(i, axs, plot_data_list)
        fig.tight_layout()
        out = os.path.join(out_dir, f"{prefix}_{i:03}.png")
        fig.savefig(out, dpi=dpi)
        paths.append(out)
    plt.close(fig)
    return paths
