// pybind binding for the reference rotated NMS + rotated box IoU CPU
// kernels (parity oracles only). With angle == 0 these are also exact
// oracles for axis-aligned NMS/IoU semantics.
#include <torch/extension.h>
#include "nms_rotated.h"
#include "box_iou_rotated.h"

PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("nms_rotated", &detectron2::nms_rotated_cpu, "reference rotated NMS (CPU)");
  m.def("box_iou_rotated", &detectron2::box_iou_rotated_cpu, "reference rotated IoU (CPU)");
}
