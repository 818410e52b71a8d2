"""Offline data-preparation CLIs (layer L1 of the reference):

* sens_reader      — parse ScanNet `.sens` captures and export color/depth/
                     pose/intrinsics (data_preparation/scannet_sens_reader/).
* convert_nerf     — emit NeRF-style transforms_{train,test,val,full}.json +
                     resized images (convert_to_nerf_style_data.py).
* scannet_labels   — per-instance axis-aligned bboxes + vertex labels from a
                     ScanNet scan (data_preparation/scannet_preprocess/).
"""
