from .build import load_bpe_library, build_bpe_library

__all__ = ["load_bpe_library", "build_bpe_library"]
