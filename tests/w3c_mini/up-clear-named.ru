PREFIX : <http://example/>
CLEAR NAMED
