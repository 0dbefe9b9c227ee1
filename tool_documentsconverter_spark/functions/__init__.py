from . import markdown, sniff, text  # noqa: F401
