from .meters import AverageMeter
from .seed import debugger_is_active, fix_random_seed

__all__ = ["AverageMeter", "debugger_is_active", "fix_random_seed"]
