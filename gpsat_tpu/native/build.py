"""CLI: python -m gpsat_tpu.native.build"""
from gpsat_tpu.native import build

if __name__ == "__main__":
    print(build(verbose=True))
