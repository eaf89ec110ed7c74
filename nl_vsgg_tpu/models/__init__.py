from .dsg_detr import DSGDETR, ObjectClassifierTracklet, tracklet_rank
from .losses import sttran_losses
from .matcher import HungarianMatcher, solve_lsap_auction, solve_lsap_host
from .sgcls_infer import sgcls_assign
from .sgdet_infer import sgdet_assign
from .sttran import ObjectClassifierWK, STTran, STTranTransformer
from .track import clusters_to_groups, get_sequence_groups, track_video

__all__ = ["DSGDETR", "ObjectClassifierTracklet", "tracklet_rank",
           "sttran_losses", "HungarianMatcher", "solve_lsap_auction",
           "solve_lsap_host", "sgcls_assign", "sgdet_assign",
           "ObjectClassifierWK", "STTran", "STTranTransformer",
           "clusters_to_groups", "get_sequence_groups", "track_video"]
