from .DerivChecker import FDDerivChecker
