from . import stateful, windows  # noqa: F401

# dedup / near_dup / minhash_lsh are imported at use (they pull the
# keyed-state machinery; consumers import the module they need)
