from .simplevis import bev_plot, save_bev
