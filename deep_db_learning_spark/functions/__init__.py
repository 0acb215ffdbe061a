from . import datetime_funcs, encode, hashing, normalize, text, vectors

__all__ = ["datetime_funcs", "encode", "hashing", "normalize", "text", "vectors"]
