"""Shared import shim for the reference tree (/root/reference).

The reference imports `mmengine.model.BaseModule` (only as a plain Module
base) and its compiled `nms_1d_cpu` extension; install stand-ins so its
modules import in this environment.
"""

import sys
import types

REFERENCE = "/root/reference"


def install():
    import torch.nn as nn

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

    mm = types.ModuleType("mmengine")
    mmm = types.ModuleType("mmengine.model")
    mmm.BaseModule = BaseModule
    mm.model = mmm
    sys.modules.setdefault("mmengine", mm)
    sys.modules.setdefault("mmengine.model", mmm)
    sys.modules.setdefault("nms_1d_cpu", types.ModuleType("nms_1d_cpu"))
