"""Import the PyTorch reference (read-only, /root/reference) on CPU for golden tests.

The reference hard-codes CUDA in a few constructors; we patch torch's device
movement to retarget 'cuda' -> 'cpu' and stub the tiny `easydict` dependency.
Nothing from the reference is copied into this repo — it is only executed at
test time to produce golden tensors.
"""
import sys
import types

REF = "/root/reference"


def _ensure_stubs():
    if "easydict" not in sys.modules:
        m = types.ModuleType("easydict")

        class EasyDict(dict):
            __getattr__ = dict.__getitem__
            __setattr__ = dict.__setitem__

        m.EasyDict = EasyDict
        sys.modules["easydict"] = m
    # light stubs for reference-only deps absent in this environment; only
    # attributes touched at import time need to exist
    if "plyfile" not in sys.modules:
        m = types.ModuleType("plyfile")
        m.PlyData = object
        sys.modules["plyfile"] = m
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        io = types.ModuleType("skimage.io")
        io.imread = None
        io.imsave = None
        sk.io = io
        sys.modules["skimage"] = sk
        sys.modules["skimage.io"] = io
    if "transforms3d" not in sys.modules:
        t3 = types.ModuleType("transforms3d")
        ax = types.ModuleType("transforms3d.axangles")
        ax.mat2axangle = None
        eu = types.ModuleType("transforms3d.euler")
        eu.euler2mat = None
        t3.axangles = ax
        t3.euler = eu
        sys.modules["transforms3d"] = t3
        sys.modules["transforms3d.axangles"] = ax
        sys.modules["transforms3d.euler"] = eu
    if "h5py" not in sys.modules:
        try:
            import h5py  # noqa: F401
        except ImportError:
            sys.modules["h5py"] = types.ModuleType("h5py")


def load_reference_nr():
    """Returns the reference's `network` package modules, importable on CPU."""
    _ensure_stubs()
    import torch

    if not getattr(torch.Tensor.to, "_cpu_patched", False):
        _orig_to = torch.Tensor.to

        def _to(self, *args, **kwargs):
            args = tuple(
                "cpu" if (isinstance(a, str) and a.startswith("cuda")) else a
                for a in args
            )
            dev = kwargs.get("device")
            if isinstance(dev, str) and dev.startswith("cuda"):
                kwargs["device"] = "cpu"
            return _orig_to(self, *args, **kwargs)

        _to._cpu_patched = True
        torch.Tensor.to = _to
        torch.Tensor.cuda = lambda self, *a, **k: self

    for p in (f"{REF}/src/nr", f"{REF}/src"):
        if p not in sys.path:
            sys.path.insert(0, p)

    import network.render_ops as render_ops
    import network.ops as ops
    import network.dist_decoder as dist_decoder
    import network.renderer as renderer
    import network.aggregate_net as aggregate_net
    import network.ibrnet as ibrnet

    return types.SimpleNamespace(
        render_ops=render_ops, ops=ops, dist_decoder=dist_decoder,
        renderer=renderer, aggregate_net=aggregate_net, ibrnet=ibrnet,
    )


def rand_cameras(rng, n, h, w, radius=0.5, center=(0.0, 0.0, 0.05)):
    """Random hemisphere cameras looking at `center`; returns (poses w2c [n,3,4], Ks)."""
    import numpy as np

    poses, Ks = [], []
    for i in range(n):
        az = rng.uniform(0, 2 * np.pi)
        el = rng.uniform(np.deg2rad(15), np.deg2rad(60))
        eye = np.array(center) + radius * np.array(
            [np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)]
        )
        fwd = np.array(center) - eye
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], 0)  # world->cam rows
        t = -R @ eye
        poses.append(np.concatenate([R, t[:, None]], 1).astype(np.float32))
        f = 0.9 * w
        Ks.append(np.array([[f, 0, w / 2 - 0.5], [0, f, h / 2 - 0.5], [0, 0, 1]], np.float32))
    import numpy as np
    return np.stack(poses), np.stack(Ks)


def load_reference_function(relpath: str, funcname: str, globals_extra=None):
    """Extract ONE function from a reference source file by AST and exec it,
    avoiding module-level side effects (e.g. dataset/train_dataset.py imports
    asset.py which eagerly loads CSVs). Returns the compiled function."""
    import ast

    path = f"{REF}/{relpath}"
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == funcname:
            mod = ast.Module(body=[node], type_ignores=[])
            code = compile(mod, filename=path, mode="exec")
            import numpy as np
            ns = {"np": np, "numpy": np}
            ns.update(globals_extra or {})
            exec(code, ns)
            return ns[funcname]
    raise KeyError(f"{funcname} not found in {relpath}")
