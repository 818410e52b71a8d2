from .sampling import stratified_sample, sample_pdf, merge_z_vals
from .compositing import composite, composite_instance

__all__ = [
    "stratified_sample",
    "sample_pdf",
    "merge_z_vals",
    "composite",
    "composite_instance",
]
