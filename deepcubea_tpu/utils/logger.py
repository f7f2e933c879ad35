"""Stdout tee logger (reference utils/data_utils.py:12-23): every line goes
to the terminal and an append-mode output.txt, flushed per write."""

from __future__ import annotations

import sys


class Logger:
    def __init__(self, path: str, mode: str = "a"):
        self.terminal = sys.stdout
        self.file = open(path, mode)

    def write(self, message: str):
        self.terminal.write(message)
        self.file.write(message)
        self.flush()

    def flush(self):
        self.terminal.flush()
        self.file.flush()

    def close(self):
        self.file.close()


def install_logger(path: str) -> Logger:
    logger = Logger(path)
    sys.stdout = logger
    return logger
