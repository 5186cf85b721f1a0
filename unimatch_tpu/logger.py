"""TensorBoard training logger with running means and image panels.

Capability parity with reference utils/logger.py: running-mean scalar push
(:82-95), learning-rate summary, colorized flow / disparity-error / depth
image summaries (:39-71).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class Logger:
    def __init__(self, log_dir: str, summary_freq: int = 100, start_step: int = 0):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(log_dir)
        self.summary_freq = summary_freq
        self.total_steps = start_step
        self.running: Dict[str, float] = {}

    def push(self, metrics: Dict[str, float], prefix: str = "train") -> None:
        self.total_steps += 1
        for k, v in metrics.items():
            key = f"{prefix}/{k}"
            self.running[key] = self.running.get(key, 0.0) + float(v)
        if self.total_steps % self.summary_freq == 0:
            for k, v in self.running.items():
                self.writer.add_scalar(k, v / self.summary_freq, self.total_steps)
            self.running = {}

    def add_scalar(self, key: str, value: float, step: Optional[int] = None) -> None:
        self.writer.add_scalar(key, float(value), step if step is not None else self.total_steps)

    def add_dict(self, metrics: Dict[str, float], prefix: str, step: Optional[int] = None) -> None:
        for k, v in metrics.items():
            self.add_scalar(f"{prefix}/{k}", v, step)

    def add_image_summary(self, img0: np.ndarray, img1: np.ndarray, flow_pred: np.ndarray,
                          flow_gt: Optional[np.ndarray] = None, step: Optional[int] = None) -> None:
        """img0 | img1 | colorized pred | colorized gt (reference logger.py:39-61)."""
        from unimatch_tpu.utils.flow_viz import flow_to_image

        panel = [img0.astype(np.uint8), img1.astype(np.uint8), flow_to_image(flow_pred)]
        if flow_gt is not None:
            panel.append(flow_to_image(flow_gt))
        img = np.concatenate(panel, axis=0)
        self.writer.add_image("train/panel", img.transpose(2, 0, 1),
                              step if step is not None else self.total_steps)

    def add_disp_image_summary(self, left: np.ndarray, disp_pred: np.ndarray,
                               disp_gt: np.ndarray, step: Optional[int] = None) -> None:
        """left | inferno pred | inferno gt | KITTI error map (reference main_stereo.py:446-475)."""
        from unimatch_tpu.utils.visualization import disp_error_img, vis_disparity

        panel = [left.astype(np.uint8), vis_disparity(disp_pred), vis_disparity(disp_gt),
                 disp_error_img(disp_pred, disp_gt)]
        img = np.concatenate(panel, axis=0)
        self.writer.add_image("train/disp_panel", img.transpose(2, 0, 1),
                              step if step is not None else self.total_steps)

    def add_depth_image_summary(self, img: np.ndarray, depth_pred: np.ndarray,
                                depth_gt: np.ndarray, step: Optional[int] = None) -> None:
        """img | plasma inverse-depth pred | gt (reference logger.py:63-71)."""
        from unimatch_tpu.utils.visualization import viz_depth_tensor

        panel = [img.astype(np.uint8), viz_depth_tensor(depth_pred), viz_depth_tensor(depth_gt)]
        img_out = np.concatenate(panel, axis=0)
        self.writer.add_image("train/depth_panel", img_out.transpose(2, 0, 1),
                              step if step is not None else self.total_steps)

    def close(self):
        self.writer.close()
