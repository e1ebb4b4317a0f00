"""``python -m tpuhar`` → the pipeline CLI (same surface as ``main.py``)."""
from .cli import main

if __name__ == "__main__":
    main()
