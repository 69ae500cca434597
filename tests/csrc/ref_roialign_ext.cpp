// pybind binding for the reference ROIAlign_cpu.cpp (parity oracle only).
// Exposes detectron2::ROIAlign_forward_cpu / ROIAlign_backward_cpu to the
// test suite via torch.utils.cpp_extension.
#include <torch/extension.h>
#include "ROIAlign.h"

PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("forward", &detectron2::ROIAlign_forward_cpu, "reference ROIAlign forward (CPU)");
  m.def("backward", &detectron2::ROIAlign_backward_cpu, "reference ROIAlign backward (CPU)");
}
