// pybind binding for the reference cocoeval.cpp (parity oracle only).
// Exposes detectron2::COCOeval::EvaluateImages / Accumulate with the same
// registration surface as the reference's vision.cpp:108-116, so the test
// suite can drive the ACTUAL reference match/accumulate implementation
// through the fast_eval_api.py:24-116 protocol.
#include <torch/extension.h>
#include "cocoeval.h"

namespace COCOeval = detectron2::COCOeval;

PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("COCOevalAccumulate", &COCOeval::Accumulate, "COCOeval::Accumulate");
  m.def(
      "COCOevalEvaluateImages",
      &COCOeval::EvaluateImages,
      "COCOeval::EvaluateImages");
  pybind11::class_<COCOeval::InstanceAnnotation>(m, "InstanceAnnotation")
      .def(pybind11::init<uint64_t, double, double, bool, bool>());
  pybind11::class_<COCOeval::ImageEvaluation>(m, "ImageEvaluation")
      .def(pybind11::init<>());
}
