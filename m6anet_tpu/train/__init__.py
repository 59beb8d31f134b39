from .builder import build_dataloader, build_mode_dataset  # noqa: F401
from .loop import make_eval_step, make_optimizer, make_train_step, train, train_one_epoch, validate  # noqa: F401
from .losses import LOSS_REGISTRY, binary_cross_entropy_loss, build_loss_function, weighted_binary_cross_entropy_loss  # noqa: F401
from .metrics import get_accuracy, get_pr_auc, get_roc_auc  # noqa: F401
