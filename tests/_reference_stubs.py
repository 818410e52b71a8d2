"""Shared import stubs for using /root/reference as a test oracle.

The reference imports several packages unavailable here (open3d, numba,
kornia, torchvision, torch_optimizer, pandas, ipdb). Stub them with just
enough surface for module import; test order must not matter, so existing
bare stubs are upgraded in place.
"""

import sys
import types


def install_reference_stubs():
    for name in ("open3d", "pandas", "torch_optimizer", "ipdb"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)

    nb = sys.modules.get("numba")
    if nb is None or not hasattr(nb, "jit"):
        nb = nb or types.ModuleType("numba")
        nb.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = nb

    kn = sys.modules.get("kornia")
    if kn is None or not hasattr(kn, "create_meshgrid"):
        kn = kn or types.ModuleType("kornia")
        kn.create_meshgrid = lambda *a, **k: None
        losses = types.ModuleType("kornia.losses")
        losses.ssim = None
        kn.losses = losses
        sys.modules["kornia"] = kn
        sys.modules["kornia.losses"] = losses

    tv = sys.modules.get("torchvision")
    if tv is None or not hasattr(tv, "transforms"):
        tv = tv or types.ModuleType("torchvision")
        tv.transforms = types.SimpleNamespace(ToTensor=object)
        sys.modules["torchvision"] = tv
