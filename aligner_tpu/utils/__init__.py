from .masks import lattice_mask, lengths_from_lattice_mask, sequence_mask

__all__ = ["lattice_mask", "lengths_from_lattice_mask", "sequence_mask"]
