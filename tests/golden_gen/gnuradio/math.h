#pragma once
// stub for <gnuradio/math.h> — /root/reference/lib/fast_atan2f.cc only
// needs the include to exist (it defines gr::clenabled::fast_atan2f itself)
