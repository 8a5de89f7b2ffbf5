"""Command-line entry points: quantize, finetune (PV), evaluate, convert, serve."""
