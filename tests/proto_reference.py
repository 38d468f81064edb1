"""Builds reference protobuf message classes for golden codec tests.

The schema mirrors the reference wire contract (reference: types.proto:1-46)
but is constructed programmatically via a descriptor pool, so tests can
verify byte-level compatibility of lfr_tpu.io.protos against the canonical
protobuf implementation without any generated code.
"""

from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

_pool = descriptor_pool.DescriptorPool()


def _field(name, number, ftype, label=1, type_name=None):
    f = descriptor_pb2.FieldDescriptorProto()
    f.name = name
    f.number = number
    f.type = ftype
    f.label = label
    if type_name:
        f.type_name = type_name
    return f


T = descriptor_pb2.FieldDescriptorProto
REP = 3

_file = descriptor_pb2.FileDescriptorProto()
_file.name = "lfr_test_types.proto"
_file.syntax = "proto3"

_mf = _file.message_type.add()
_mf.name = "MatchingFile"
_pair = _mf.nested_type.add()
_pair.name = "ImagePair"
_match = _pair.nested_type.add()
_match.name = "Match"
_disp = _match.nested_type.add()
_disp.name = "Displacement"
_disp.field.extend([
    _field("di", 1, T.TYPE_FLOAT),
    _field("dj", 2, T.TYPE_FLOAT),
])
_match.field.extend([
    _field("feature_idx1", 1, T.TYPE_UINT32),
    _field("feature_idx2", 2, T.TYPE_UINT32),
    _field("similarity", 3, T.TYPE_FLOAT),
    _field("disp1", 4, T.TYPE_MESSAGE, REP, ".MatchingFile.ImagePair.Match.Displacement"),
    _field("disp2", 5, T.TYPE_MESSAGE, REP, ".MatchingFile.ImagePair.Match.Displacement"),
])
_pair.field.extend([
    _field("image_name1", 1, T.TYPE_STRING),
    _field("fact1", 2, T.TYPE_FLOAT),
    _field("image_name2", 3, T.TYPE_STRING),
    _field("fact2", 4, T.TYPE_FLOAT),
    _field("matches", 5, T.TYPE_MESSAGE, REP, ".MatchingFile.ImagePair.Match"),
])
_mf.field.extend([
    _field("image_pairs", 1, T.TYPE_MESSAGE, REP, ".MatchingFile.ImagePair"),
])

_sf = _file.message_type.add()
_sf.name = "SolutionFile"
_img = _sf.nested_type.add()
_img.name = "Image"
_sdisp = _img.nested_type.add()
_sdisp.name = "Displacement"
_sdisp.field.extend([
    _field("feature_idx", 1, T.TYPE_UINT32),
    _field("di", 2, T.TYPE_FLOAT),
    _field("dj", 3, T.TYPE_FLOAT),
])
_img.field.extend([
    _field("image_name", 1, T.TYPE_STRING),
    _field("fact", 2, T.TYPE_FLOAT),
    _field("displacements", 3, T.TYPE_MESSAGE, REP, ".SolutionFile.Image.Displacement"),
])
_sf.field.extend([
    _field("images", 1, T.TYPE_MESSAGE, REP, ".SolutionFile.Image"),
])

_pool.Add(_file)

MatchingFile = message_factory.GetMessageClass(_pool.FindMessageTypeByName("MatchingFile"))
SolutionFile = message_factory.GetMessageClass(_pool.FindMessageTypeByName("SolutionFile"))
