"""Import the ACTUAL reference torch implementation from /root/reference.

The parity tests compare our JAX model against the real reference code, not
freshly-written oracles (which could replicate a misreading). The reference
needs a handful of packages absent from this image (numba, torchaudio,
hydra/lightning/omegaconf further up the package tree); we stub exactly those
and bypass the heavyweight package __init__ chain with fake parent packages so
only the pure-torch model files execute.

Covers: optispeech.model.generator (generator, alignments, loss, all backbone
modules) and optispeech.model.vocoder.wavenext.
"""

import importlib.util
import sys
import types

REF = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _fake_pkg(name, path):
    if name in sys.modules:
        return sys.modules[name]
    pkg = types.ModuleType(name)
    pkg.__path__ = [path]
    pkg.__package__ = name
    sys.modules[name] = pkg
    return pkg


def _load_file(name, path):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    """Returns (generator_module, wavenext_module, modules_package)."""
    if "optispeech.model.generator" in sys.modules:
        return (
            sys.modules["optispeech.model.generator"],
            sys.modules["optispeech.model.vocoder.wavenext"],
            sys.modules["optispeech.model.generator.modules"],
        )

    # numba: alignments.py only uses @jit(nopython=True) as a decorator; the
    # undecorated pure-python DP is slow but correct for tiny test shapes.
    def _nojit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f

    _stub("numba", jit=_nojit)
    # torchaudio: imported by generator/loss.py but never used there.
    _stub("torchaudio")

    # Fake parents so optispeech/__init__ (hydra/lightning) never executes.
    _fake_pkg("optispeech", f"{REF}/optispeech")
    _fake_pkg("optispeech.model", f"{REF}/optispeech/model")

    # Real utils files (pure torch/numpy), loaded directly.
    utils_model = _load_file("optispeech.utils.model", f"{REF}/optispeech/utils/model.py")
    utils_segments = _load_file("optispeech.utils.segments", f"{REF}/optispeech/utils/segments.py")

    # Fake optispeech.utils exposing the re-export surface the model files use.
    utils = _fake_pkg("optispeech.utils", f"{REF}/optispeech/utils")
    for attr in dir(utils_model):
        if not attr.startswith("_"):
            setattr(utils, attr, getattr(utils_model, attr))
    utils.model = utils_model
    utils.segments = utils_segments

    import optispeech.model.generator as refgen
    import optispeech.model.vocoder.wavenext as refwavenext
    import optispeech.model.generator.modules as refmodules

    return refgen, refwavenext, refmodules
