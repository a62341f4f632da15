from .xxhash32 import xxh32
from .probagen import generate_proba, make_proba_buffer
