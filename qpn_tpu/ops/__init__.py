from . import batch_qp, avi, linalg

__all__ = ["batch_qp", "avi", "linalg"]
