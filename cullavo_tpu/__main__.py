"""``python -m cullavo_tpu`` launcher (the reference is driven as
``python entry.py train/eval …``, entry.py:47-58)."""
from cullavo_tpu.entry import main

if __name__ == "__main__":
    main()
