"""PNG encoder (placeholder, replaced by full implementation)."""


def encode(*a, **k):
    raise NotImplementedError


def encode_batch(*a, **k):
    raise NotImplementedError


def encode_indexed(*a, **k):
    raise NotImplementedError
