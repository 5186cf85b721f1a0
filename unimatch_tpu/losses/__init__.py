from unimatch_tpu.losses.flow import flow_loss
from unimatch_tpu.losses.stereo import stereo_loss
from unimatch_tpu.losses.depth import depth_loss, depth_grad_loss

__all__ = ["flow_loss", "stereo_loss", "depth_loss", "depth_grad_loss"]
