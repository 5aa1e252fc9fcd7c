# Shared TPU-campaign harness (ADVICE r4 #2-#4: the run_job/kill_tree/note
# trio was duplicated verbatim across tpu_campaign4{r,s,t}.sh, the kill
# only reaped one process generation, and job adoption trusted a PID file
# without validating the command line).
#
# Usage: set TAG (log prefix) then `source scripts/campaign_lib.sh`.
# Jobs are started with setsid so the job PID doubles as its process-group
# id; kill_group kills the whole tree (grandchildren included).
L=${L:-/tmp/tpu_campaign.log}
STALL=${STALL:-900}
TAG=${TAG:-campaign}

note() { echo "$(date +%H:%M:%S) [$TAG] $*" >> "$L"; }

kill_group() {
  local pid=$1
  kill -- "-$pid" 2>/dev/null || kill "$pid" 2>/dev/null
  sleep 10
  kill -9 -- "-$pid" 2>/dev/null || kill -9 "$pid" 2>/dev/null
}

pid_matches() {
  # validate an adopted PID's command line before watching/killing it:
  # after a VM restart, PID reuse could otherwise adopt (and later
  # stall-kill) an unrelated process
  local pid=$1 pat=$2
  tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null | grep -q "$pat"
}

watch_pid() {
  # watchdog an existing job: wait for it, stall-kill if its log wedges
  local jpid=$1 log=$2 age
  while kill -0 "$jpid" 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || echo 0) ))
    if [ "$age" -gt "$STALL" ]; then
      note "adopted job WEDGED (log quiet ${age}s) — killing $jpid"
      kill_group "$jpid"
      return 1
    fi
  done
  return 0
}

run_job() {
  # run_job <name> <timeout_s> <cmd...>: 2 attempts, log-stall watchdog,
  # whole-group kill on wedge. Log: /tmp/q_<name>.log, PID: /tmp/q_<name>.pid
  local name=$1 tmo=$2; shift 2
  local log=/tmp/q_${name}.log
  local attempt rc stalled jpid age
  for attempt in 1 2; do
    note "job $name attempt $attempt: $*"
    : > "$log"
    setsid timeout "$tmo" "$@" >> "$log" 2>&1 &
    jpid=$!
    echo "$jpid" > "/tmp/q_${name}.pid"
    stalled=0
    while kill -0 "$jpid" 2>/dev/null; do
      sleep 60
      age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || echo 0) ))
      if [ "$age" -gt "$STALL" ]; then
        note "job $name WEDGED (log quiet ${age}s) — killing group $jpid"
        kill_group "$jpid"
        stalled=1
        break
      fi
    done
    wait "$jpid" 2>/dev/null; rc=$?
    if [ "$stalled" -eq 1 ]; then
      note "job $name attempt $attempt wedged; retrying"
      continue
    fi
    note "job $name rc=$rc; tail: $(tail -1 "$log" | cut -c1-200)"
    [ "$rc" -eq 0 ] && return 0
  done
  note "job $name GAVE UP after 2 attempts"
  return 1
}
