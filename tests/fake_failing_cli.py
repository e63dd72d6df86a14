"""Test stub: a CLI module whose main() fails before its finalize barrier
(used to pin the eval runner's finalize-lockstep catch-up)."""


def main(argv=None):
    raise RuntimeError("boom before finalize")
