from .mmoc import MMOCTransport  # noqa: F401
