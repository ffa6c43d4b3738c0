"""Polynomial layer: NTT/iNTT, coset LDE, polynomial utilities.

Reference equivalent: `plonky2_field` fft/polynomial modules (pin
/root/reference/Cargo.lock:3466), used by starky for trace commitments.

Use as `poly.ntt.ntt(...)` — the submodule is not flattened here to keep
module/function names unambiguous.
"""

from . import ntt  # noqa: F401
