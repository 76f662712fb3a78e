"""speech_tpu: a TPU-native speech feature-extraction framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
``pydrobert-speech`` (the reference implementation): log-mel filter banks,
gammatone/gabor filter outputs, deltas, CMVN, streaming computation, a
JSON/YAML-driven config factory, audio decoding (including NIST SPHERE with
embedded "shorten" compression), and corpus-scale extraction tools.

Architecture: filter banks and windows are host-side float64 "config ->
weights compilers"; feature extraction is a fused, jittable array program
(framing by gather, the windowed DFT as MXU matmuls, filter reduction as one
matmul).  Batch and corpus scale come from ``vmap``/``shard_map`` over device
meshes rather than per-utterance Python loops.
"""

__version__ = "0.5.0"

from . import alias, config, scales, utils  # noqa: F401
from . import filters, compute  # noqa: F401
from . import pre, post  # noqa: F401
from . import corpus, nn, parallel, profiling  # noqa: F401

# heavier / optional-dependency modules are imported lazily:
#   speech_tpu.io       (audio decoding; always importable but large)
#   speech_tpu.torch    (requires torch)
#   speech_tpu.vis      (requires matplotlib)
#   speech_tpu.command_line


def __getattr__(name):
    # deprecated top-level re-exports, mirroring the reference's shim
    # (reference: __init__.py:39-48); canonical home is speech_tpu.alias
    if name in ("AliasedFactory", "alias_factory_subclass_from_arg"):
        import warnings

        warnings.warn(
            f"using {name} from speech_tpu is deprecated; import it from "
            "speech_tpu.alias",
            category=DeprecationWarning,
            stacklevel=2,
        )
        return getattr(alias, name)
    raise AttributeError(f"module 'speech_tpu' has no attribute '{name}'")
