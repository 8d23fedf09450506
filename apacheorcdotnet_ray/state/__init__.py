"""Job state: manifests + lineage for resumable encode jobs."""

from .manifest import Manifest  # noqa: F401
