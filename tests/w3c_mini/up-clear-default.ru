PREFIX : <http://example/>
CLEAR DEFAULT
