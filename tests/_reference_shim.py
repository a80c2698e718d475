"""Shared import shim for the reference tree (/root/reference).

The reference imports `mmengine.model.BaseModule` (only as a plain Module
base) and its compiled `nms_1d_cpu` extension; install stand-ins so its
modules import in this environment.

The `nms_1d_cpu` stand-in is FUNCTIONAL: it exposes the reference
extension's exact API (`nms(segs, scores, iou_threshold)` and
`softnms(segs, scores, dets, iou_threshold, sigma, min_score, method)`,
/root/reference/libs/utils/csrc/nms_cpu.cpp:172-182) backed by our native
host NMS (native/nms1d.c via ops/nms_host.py). This lets tests execute the
reference's real inference()/postprocessing()/batched_nms tail end-to-end
(multimodal_meta_archs.py:688-875, libs/utils/nms.py:38-190) instead of
stopping at the model outputs.
"""

import sys
import types

import numpy as np

REFERENCE = "/root/reference"


def _populate_nms_module(mod):
    """Attach functional nms/softnms to `mod` (idempotent).

    Mutates the existing module object so the binding inside an
    already-imported `libs.utils.nms` picks the functions up too.
    """
    if getattr(mod, "_functional", False):
        return
    import torch

    from unav_yolyolva_tpu.ops.nms_host import hard_nms_host, soft_nms_host

    def nms(segs, scores, iou_threshold):
        # reference nms_1d_cpu.nms: greedy hard NMS over descending scores,
        # returns surviving indices in that order (nms_cpu.cpp:19-58)
        s = np.ascontiguousarray(segs.detach().cpu().numpy(), np.float32)
        sc = np.ascontiguousarray(scores.detach().cpu().numpy(), np.float32)
        if s.shape[0] == 0:
            return torch.zeros((0,), dtype=torch.long)
        idx, _ = hard_nms_host(s, sc, float(iou_threshold))
        return torch.from_numpy(np.ascontiguousarray(idx))

    def softnms(segs, scores, dets, iou_threshold, sigma, min_score, method):
        # reference nms_1d_cpu.softnms: sequential Soft-NMS, fills `dets`
        # rows (start, end, decayed score) in selection order and returns
        # the surviving original indices (nms_cpu.cpp:67-160)
        s = np.ascontiguousarray(segs.detach().cpu().numpy(), np.float32)
        sc = np.ascontiguousarray(scores.detach().cpu().numpy(), np.float32)
        if s.shape[0] == 0:
            return torch.zeros((0,), dtype=torch.long)
        idx, dec = soft_nms_host(
            s, sc, float(iou_threshold), float(sigma), float(min_score),
            int(method),
        )
        k = len(idx)
        if k:
            dets[:k, 0] = torch.from_numpy(s[idx, 0])
            dets[:k, 1] = torch.from_numpy(s[idx, 1])
            dets[:k, 2] = torch.from_numpy(dec)
        return torch.from_numpy(np.ascontiguousarray(idx))

    mod.nms = nms
    mod.softnms = softnms
    mod._functional = True


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
    nms_mod = sys.modules.setdefault(
        "nms_1d_cpu", types.ModuleType("nms_1d_cpu")
    )
    try:
        _populate_nms_module(nms_mod)
    except Exception:
        # no compiler on this host: the empty module still lets the
        # reference import; only the eval-tail tests need the functions
        pass
