from . import convert, datetime_funcs, encode, exact_agg, hashing, normalize, text, vectors

__all__ = ["convert", "datetime_funcs", "encode", "exact_agg", "hashing", "normalize", "text", "vectors"]
