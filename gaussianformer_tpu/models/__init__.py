from .segmentor import BEVSegmentor
