"""User-facing blocks mirroring gr-clenabled's block set.

Every reference GRC block (grc/clenabled_*.block.yml) has a named equivalent
here.  Constructor parameters mirror the reference ``make()`` signatures
(include/clenabled/*.h) minus the OpenCL device-selection tuple
(openCLPlatformType, devSelector, platformId, devId, setDebug) — device
placement is a property of the shared mesh, not of individual blocks (see
clenabled_tpu.runtime.device).  For drop-in familiarity each constructor
accepts and ignores those legacy keywords.

Reference block → class:
  clSignalSource            → SignalSource
  clFFT (fwd/rev)           → Fft
  clMultiply/clAdd/...      → Multiply, Add, Subtract, MultiplyConjugate,
                              ComplexConjugate, MathOp
  clMultConst/clAddConst    → MultiplyConst, AddConst
  clFilter (+GRC wrappers)  → Filter, LowPassFilter, HighPassFilter,
                              BandPassFilter, BandRejectFilter,
                              RootRaisedCosineFilter, FIRTapFilter
  clComplexFilter           → ComplexFilter
  clPolyphaseChannelizer    → PolyphaseChannelizer
  clQuadratureDemod         → QuadratureDemod
  clCostasLoop              → CostasLoop
  clComplexToMag/Arg/...    → ComplexToMag, ComplexToArg, ComplexToMagPhase,
                              MagPhaseToComplex
  clLog/clLog10             → Log
  clSNR                     → SNRHelper
  clKernel1To1/clKernel2To1 → Kernel1To1, Kernel2To1
  clXCorrelate              → XCorrelate (message port "corr")
  clxcorrelate_fft_vcf      → XCorrelateFFTVCF
  clXEngine                 → XEngine (message port "xcorr")
"""

from clenabled_tpu.blocks.core import (  # noqa: F401
    SignalSource,
    Fft,
    MathOp,
    Multiply,
    Add,
    Subtract,
    MultiplyConjugate,
    ComplexConjugate,
    MultiplyConst,
    AddConst,
    ComplexToMag,
    ComplexToArg,
    ComplexToMagPhase,
    MagPhaseToComplex,
    Log,
    SNRHelper,
    Kernel1To1,
    Kernel2To1,
)
from clenabled_tpu.blocks.filters import (  # noqa: F401
    Filter,
    ComplexFilter,
    LowPassFilter,
    HighPassFilter,
    BandPassFilter,
    BandRejectFilter,
    RootRaisedCosineFilter,
    FIRTapFilter,
    FirFilterSCC,
    FirFilterFSF,
    InterpFirFilter,
    PolyphaseChannelizer,
)
from clenabled_tpu.blocks.demod import QuadratureDemod, CostasLoop  # noqa: F401
from clenabled_tpu.blocks.correlators import (  # noqa: F401
    XCorrelate,
    XCorrelateFFTVCF,
    XEngine,
)

# Reference-name aliases (clFFT = Fft, etc.) for one-to-one discoverability.
clSignalSource = SignalSource
clFFT = Fft
clMathOp = MathOp
clMultiply = Multiply
clAdd = Add
clSubtract = Subtract
clMultiplyConjugate = MultiplyConjugate
clComplexConjugate = ComplexConjugate
clMathConst = MultiplyConst
clMultConst = MultiplyConst
clAddConst = AddConst
clFilter = Filter
clComplexFilter = ComplexFilter
clLowPassFilter = LowPassFilter
clHighPassFilter = HighPassFilter
clBandPassFilter = BandPassFilter
clBandRejectFilter = BandRejectFilter
clRootRaisedCosine = RootRaisedCosineFilter
clFIRTapFilter = FIRTapFilter
clPolyphaseChannelizer = PolyphaseChannelizer
clQuadratureDemod = QuadratureDemod
clCostasLoop = CostasLoop
clComplexToMag = ComplexToMag
clComplexToArg = ComplexToArg
clComplexToMagPhase = ComplexToMagPhase
clMagPhaseToComplex = MagPhaseToComplex
clLog = Log
clLog10 = Log
clSNR = SNRHelper
clKernel1To1 = Kernel1To1
clKernel2To1 = Kernel2To1
clXCorrelate = XCorrelate
clxcorrelate_fft_vcf = XCorrelateFFTVCF
clXEngine = XEngine
