"""Exception hierarchy (reference parity: ``src/pos_core/exceptions.py``).

``PosAPIError`` is the package base; domain errors subclass it. The
data-quality errors also subclass ``ValueError`` so call sites that
guard with ``except ValueError`` (the reference's habit) keep working.
"""

from __future__ import annotations


class PosAPIError(Exception):
    """Base class for all domain-specific errors in the package."""


class ConfigError(PosAPIError, ValueError):
    """Invalid configuration (branch windows, modes, grains)."""


class DataQualityError(PosAPIError, ValueError):
    """A pipeline-failing data-quality gate fired (e.g. the tip gate)."""


class ETLError(PosAPIError):
    """A stage failed to run."""


class ExtractionError(ETLError):
    """The remote export could not be fetched or decoded."""
