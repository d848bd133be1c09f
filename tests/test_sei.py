"""SEI subsystem: writer (encoder/sei_writer) <-> reader (hostdec/sei)
round-trips per payload type, mirroring reference SEIwrite.cpp/SEIread.cpp.
"""
from libhm_tpu.encoder import sei_writer as W
from libhm_tpu.hostdec import sei as S
from libhm_tpu.hostdec.params import SPS, VUI, HRD


def _decode_one(ptype, payload, sps=None):
    rbsp = W.sei_rbsp([(ptype, payload)])
    out = S.decode_sei_payloads(rbsp, sps)
    assert len(out) == 1 and out[0][0] == ptype
    return out[0][1]


def test_active_parameter_sets():
    o = _decode_one(S.SEI_ACTIVE_PARAMETER_SETS,
                    W.active_parameter_sets(vps_id=2, sps_ids=(0, 1)))
    assert o.active_video_parameter_set_id == 2
    assert o.active_seq_parameter_set_id == [0, 1]


def test_recovery_point():
    o = _decode_one(S.SEI_RECOVERY_POINT,
                    W.recovery_point(recovery_poc_cnt=-3, exact_match=1))
    assert o.recovery_poc_cnt == -3
    assert o.exact_match == 1 and o.broken_link == 0


def test_user_data_unregistered():
    o = _decode_one(S.SEI_USER_DATA_UNREGISTERED,
                    W.user_data_unregistered(b"\xaa" * 16, b"hello"))
    assert o.uuid == b"\xaa" * 16 and o.data == b"hello"


def test_mastering_display():
    o = _decode_one(S.SEI_MASTERING_DISPLAY, W.mastering_display(
        [(100, 200), (300, 400), (500, 600)], (7, 8), 10000, 1))
    assert o.primaries == [(100, 200), (300, 400), (500, 600)]
    assert o.white_point == (7, 8)
    assert o.max_luminance == 10000 and o.min_luminance == 1


def test_time_code():
    o = _decode_one(S.SEI_TIME_CODE, W.time_code(
        [{"counting_type": 1, "n_frames": 12, "seconds": 30, "minutes": 5,
          "hours": 2}, {}]))
    assert o.num_clock_ts == 2
    assert o.clock_ts[0]["n_frames"] == 12
    assert o.clock_ts[0]["hours"] == 2
    assert o.clock_ts[1] == {}


def test_display_orientation():
    o = _decode_one(S.SEI_DISPLAY_ORIENTATION,
                    W.display_orientation(hor_flip=1, rotation=90))
    assert o.hor_flip == 1 and o.anticlockwise_rotation == 90


def test_frame_packing():
    o = _decode_one(S.SEI_FRAME_PACKING, W.frame_packing(arrangement_type=3))
    assert o.arrangement_type == 3 and o.arrangement_cancel == 0


def test_temporal_level0_index():
    o = _decode_one(S.SEI_TEMPORAL_LEVEL0_INDEX,
                    W.temporal_level0_index(4, 9))
    assert o.tl0_idx == 4 and o.rap_idx == 9


def test_region_refresh_and_no_display():
    o = _decode_one(S.SEI_REGION_REFRESH_INFO, W.region_refresh_info(1))
    assert o.refreshed_region_flag == 1
    o = _decode_one(S.SEI_NO_DISPLAY, W.no_display())
    assert isinstance(o, S.NoDisplay)


def test_segm_rect_frame_packing():
    o = _decode_one(S.SEI_SEGM_RECT_FRAME_PACKING,
                    W.segm_rect_frame_packing(content_interp=2))
    assert o.content_interpretation_type == 2


def test_sop_description():
    entries = [{"vcl_nut": 19, "temporal_id": 0},
               {"vcl_nut": 1, "temporal_id": 1, "st_rps_idx": 2,
                "poc_delta": 4}]
    o = _decode_one(S.SEI_SOP_DESCRIPTION, W.sop_description(entries))
    assert o.num_entries == 2
    assert o.entries[0]["vcl_nut"] == 19
    assert o.entries[1]["st_rps_idx"] == 2
    assert o.entries[1]["poc_delta"] == 4


def _hrd_sps():
    hrd = HRD(nal_hrd=1, vcl_hrd=0,
              initial_cpb_removal_delay_length=24,
              au_cpb_removal_delay_length=24, dpb_output_delay_length=24,
              sub_layers=[(0, 0, 0, 1, [(100, 200, 0)], [])])
    vui = VUI(timing_info_present=1, num_units_in_tick=1, time_scale=50,
              frame_field_info_present=1, hrd=hrd)
    sps = SPS()
    sps.vui = vui
    return sps


def test_buffering_period():
    sps = _hrd_sps()
    o = _decode_one(S.SEI_BUFFERING_PERIOD,
                    W.buffering_period(sps.vui.hrd, cpb_delay=12345), sps)
    assert o.nal_cpb[0]["delay"] == 12345
    assert o.au_cpb_removal_delay_delta == 1


def test_pic_timing():
    sps = _hrd_sps()
    o = _decode_one(S.SEI_PIC_TIMING,
                    W.pic_timing(sps.vui, pic_struct=2, cpb_removal_delay=7,
                                 dpb_output_delay=3), sps)
    assert o.pic_struct == 2
    assert o.au_cpb_removal_delay == 7
    assert o.pic_dpb_output_delay == 3


def test_scalable_nesting():
    inner = W.recovery_point(recovery_poc_cnt=5)
    o = _decode_one(S.SEI_SCALABLE_NESTING,
                    W.scalable_nesting([(S.SEI_RECOVERY_POINT, inner)]))
    assert o.nested[0][0] == S.SEI_RECOVERY_POINT
    assert o.nested[0][1].recovery_poc_cnt == 5


def test_multiple_messages_one_nal():
    rbsp = W.sei_rbsp([
        (S.SEI_ACTIVE_PARAMETER_SETS, W.active_parameter_sets()),
        (S.SEI_RECOVERY_POINT, W.recovery_point()),
    ])
    out = S.decode_sei_payloads(rbsp)
    assert [t for t, _ in out] == [S.SEI_ACTIVE_PARAMETER_SETS,
                                   S.SEI_RECOVERY_POINT]


def test_user_data_registered_t35():
    o = _decode_one(S.SEI_USER_DATA_REGISTERED_ITU_T_T35,
                    W.user_data_registered_t35(0xB5, b"\x00\x31GA94"))
    assert o.country_code == 0xB5 and o.country_code_extension is None
    assert o.data == b"\x00\x31GA94"
    o = _decode_one(S.SEI_USER_DATA_REGISTERED_ITU_T_T35,
                    W.user_data_registered_t35(0xFF, b"x",
                                               country_code_extension=0x42))
    assert o.country_code == 0xFF and o.country_code_extension == 0x42
    assert o.data == b"x"


def test_pan_scan_rect():
    o = _decode_one(S.SEI_PAN_SCAN_RECT, W.pan_scan_rect(
        rect_id=3, rects=[(-16, 16, -8, 8), (0, 32, 0, 24)], persistence=1))
    assert o.rect_id == 3 and o.cancel == 0
    assert o.rects == [(-16, 16, -8, 8), (0, 32, 0, 24)]
    assert o.persistence == 1
    o = _decode_one(S.SEI_PAN_SCAN_RECT, W.pan_scan_rect(rect_id=1, cancel=1))
    assert o.cancel == 1 and o.rects == [] and o.persistence is None
