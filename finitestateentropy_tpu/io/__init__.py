from .frame import compress_file, decompress_file, compress_bytes, decompress_bytes
