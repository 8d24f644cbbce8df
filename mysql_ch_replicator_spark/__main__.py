"""``python -m mysql_ch_replicator_spark`` — the reference's main.py
entry point (reference main.py:1–6)."""

from .main import main

main()
