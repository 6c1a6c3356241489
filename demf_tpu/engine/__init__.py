from .optim import build_optimizer, step_lr_schedule
from .trainer import (TrainState, create_train_state, make_train_step,
                      make_eval_step, Runner)
from .checkpoint import (save_checkpoint, restore_checkpoint, load_params,
                         latest_checkpoint, remap_img_branch_keys)
