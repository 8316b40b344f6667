"""Decoding engine: on-device search algorithms + TextGenerator API."""

from .search import beam_search, left_align, sample_decode
