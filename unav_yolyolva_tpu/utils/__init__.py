from .meters import AverageMeter
from .seed import fix_random_seed

__all__ = ["AverageMeter", "fix_random_seed"]
