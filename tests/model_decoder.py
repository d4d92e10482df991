"""Shim: the fp64 reference decoder moved into the product
(aacjax.host.refdec) where it also serves as the decode path for
profiles with inherently sequential time-domain feedback (LTP)."""
from aacjax.host.refdec import ModelDecoder  # noqa: F401
