from .model import ShredResult, assemble, shred
from .typing_rules import apply_reference_typing
from .store import DocumentStore

__all__ = ["ShredResult", "shred", "assemble", "apply_reference_typing",
           "DocumentStore"]
