"""Model families: the feature computers and trainable frontends.

The configurable feature extractors (`speech_tpu.compute`), their
learnable counterparts (`speech_tpu.nn`, `speech_tpu.torch`), and the
named preset recipes (`speech_tpu.models.presets`: ``create("fbank-80-16k")``,
``preset_config(name)`` — also accepted by the CLI wherever a computer
config is expected).
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
from .checkpoint import TrainCheckpointer  # noqa: F401
from .kws import (  # noqa: F401
    ConvClassifier,
    KWSModel,
    StreamingKWS,
    make_train_step,
)
from .ctc import (  # noqa: F401
    CTCModel,
    TransformerEncoder,
    beam_search_decode,
    greedy_decode,
)
from .presets import PRESETS, create, preset_config  # noqa: F401
from .speaker import (  # noqa: F401
    SpeakerModel,
    StreamingSpeaker,
    TDNNEncoder,
    aam_softmax_loss,
    cosine_scores,
)
from ..streaming import (  # noqa: F401
    SIStreamState,
    StreamingSI,
    StreamingSTFT,
    StreamState,
)

__all__ = [
    "PRESETS",
    "CTCModel",
    "ConvClassifier",
    "KWSModel",
    "SpeakerModel",
    "StreamingKWS",
    "StreamingSpeaker",
    "TDNNEncoder",
    "TrainCheckpointer",
    "TransformerEncoder",
    "aam_softmax_loss",
    "beam_search_decode",
    "cosine_scores",
    "greedy_decode",
    "create",
    "make_train_step",
    "preset_config",
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
