from .sampling import bilinear_sample, bilinear_sample_nchw
from .flow_ops import backward_warp, occlusion_mask, flow_check, motion_boundary
from .density import free_cell_mask, disc_kernel
