from multimodal_sc_tpu.codec.camera_cnn import (
    CameraDecoderCNN,
    CameraEncoderCNN,
    CameraJSCC,
    CameraTokensCNN,
)
from multimodal_sc_tpu.codec.camera_vit import (
    ViTDecoderJSCC,
    ViTEncoderJSCC,
    ViTJSCC,
    ViTTokensDecoder,
)
from multimodal_sc_tpu.codec.lidar_bev import (
    LidarBEVCodec,
    PillarFeatureNet,
    occupancy_target,
    semantic_bev_target,
    voxelize,
)
