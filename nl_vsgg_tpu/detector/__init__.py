from .attr_rcnn import AttrRCNNJax, AttrRCNNModule, compute_scale, preprocess
from .convert import convert_state_dict, load_checkpoint

__all__ = ["AttrRCNNJax", "AttrRCNNModule", "compute_scale", "preprocess",
           "convert_state_dict", "load_checkpoint"]
