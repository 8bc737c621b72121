from speinet_tpu.data.indices import return_blurry_indices, gene_seq, gene_seq_nsf
from speinet_tpu.data.videodata import VideoDataset
from speinet_tpu.data.loader import Data, prefetch_to_device
