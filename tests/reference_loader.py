"""Load reference torch modules from /root/reference for golden-value tests.

The reference package has unimportable deps at the top level (webdataset,
hydra), so we load the needed leaf modules directly with importlib under a
stub ``theia`` package. Test-time comparison only — no reference code is
copied into theia_tpu.
"""

import importlib.util
import sys
import types

REF_ROOT = "/root/reference/src/theia"


def _ensure_pkg(name: str) -> None:
    if name not in sys.modules:
        mod = types.ModuleType(name)
        mod.__path__ = []
        sys.modules[name] = mod


def load_reference(module: str):
    """module e.g. "models.adapter_heads" -> loaded module object."""
    full = f"theia.{module}"
    if full in sys.modules:
        return sys.modules[full]
    _ensure_pkg("theia")
    parts = module.split(".")
    for i in range(1, len(parts)):
        _ensure_pkg("theia." + ".".join(parts[:i]))
    path = f"{REF_ROOT}/{'/'.join(parts)}.py"
    spec = importlib.util.spec_from_file_location(full, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    try:
        spec.loader.exec_module(mod)
    except ModuleNotFoundError as e:
        # lazily load intra-package deps (e.g. theia.models.adapter_heads)
        missing = e.name
        if missing and missing.startswith("theia."):
            del sys.modules[full]
            load_reference(missing.removeprefix("theia."))
            return load_reference(module)
        raise
    return mod
