from .infer import load_flow_apply, pad_to_multiple, save_flow_checkpoint
