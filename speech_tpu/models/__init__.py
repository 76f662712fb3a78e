"""Model families: the feature computers and trainable frontends.

Structural alias for the framework's "models" — the configurable feature
extractors (`speech_tpu.compute`) and their learnable counterparts
(`speech_tpu.nn`, `speech_tpu.torch`).  Everything here re-exports from
those canonical homes.
"""

from ..compute import (  # noqa: F401
    FrameComputer,
    LinearFilterBankFrameComputer,
    ShortIntegrationFrameComputer,
    ShortTimeFourierTransformFrameComputer,
    SIFrameComputer,
    STFTFrameComputer,
    frame_by_frame_calculation,
)
from ..nn import STFTFrontend  # noqa: F401
from ..streaming import (  # noqa: F401
    SIStreamState,
    StreamingSI,
    StreamingSTFT,
    StreamState,
)

__all__ = [
    "FrameComputer",
    "LinearFilterBankFrameComputer",
    "ShortIntegrationFrameComputer",
    "ShortTimeFourierTransformFrameComputer",
    "SIFrameComputer",
    "STFTFrameComputer",
    "STFTFrontend",
    "StreamingSI",
    "SIStreamState",
    "StreamingSTFT",
    "StreamState",
    "frame_by_frame_calculation",
]
