"""``python -m neural_admixture_tpu train|infer ...``"""
import sys

from .entry import main

if __name__ == "__main__":
    sys.exit(main())
