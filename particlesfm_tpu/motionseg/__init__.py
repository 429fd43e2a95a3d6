from .infer import segment_tracks, cut_windows
from .train import TrainState, create_train_state, train_step, eval_step, weighted_bce, cls_iou
