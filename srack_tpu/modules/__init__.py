"""The DSP module library and catalog.

The catalog mirrors the reference's ``get_catalog()`` registry
(src/synth.rs:421-515): the same 14 creatable module names (Output is
created by the workspace, src/main.rs:129-132), plus the build-side
``Input`` driver module.
"""

from .base import CV_DTYPE, ModuleDef
from .oscillator import OSCILLATOR, NOISE
from .filter import MOOG_FILTER
from .adsr import ADSR
from .vca import VCA
from .mixer import MONO_MIXER
from .math import ADD, SUBTRACT, MULTIPLY, NON_LINEAR
from .sequencer import GRID_SEQUENCER, PATTERN_SEQUENCER
from .sample import SAMPLE
from .freeverb import FREEVERB
from .output import OUTPUT
from .input import INPUT

# Creatable module types, in the reference's catalog order
# (src/synth.rs:421-515), with Output and Input appended.
CATALOG: dict[str, ModuleDef] = {
    d.type_name: d
    for d in (
        OSCILLATOR,
        NOISE,
        GRID_SEQUENCER,
        PATTERN_SEQUENCER,
        ADSR,
        VCA,
        MOOG_FILTER,
        MONO_MIXER,
        SAMPLE,
        ADD,
        SUBTRACT,
        MULTIPLY,
        NON_LINEAR,
        FREEVERB,
        OUTPUT,
        INPUT,
    )
}

__all__ = [
    "CATALOG",
    "CV_DTYPE",
    "ModuleDef",
    "OSCILLATOR",
    "NOISE",
    "MOOG_FILTER",
    "ADSR",
    "VCA",
    "MONO_MIXER",
    "ADD",
    "SUBTRACT",
    "MULTIPLY",
    "NON_LINEAR",
    "GRID_SEQUENCER",
    "PATTERN_SEQUENCER",
    "SAMPLE",
    "FREEVERB",
    "OUTPUT",
    "INPUT",
]
