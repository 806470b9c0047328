from .checkpoint import ResumableJob  # noqa: F401
