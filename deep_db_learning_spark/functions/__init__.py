from . import bpe, convert, datetime_funcs, encode, exact_agg, feature_eng, hashing, normalize, text, vectors

__all__ = ["bpe", "convert", "datetime_funcs", "encode", "exact_agg", "feature_eng", "hashing", "normalize", "text", "vectors"]
